"""Planar input pack ↔ soup input pack bitwise parity.

The planar pack (_pack_rows_planar) re-derives every packed row from
[W, I, T] component planes instead of the soup's [W, S, 3] arrays (whose
3-lane minor dim tile-pads 42× on TPU — measured ~15% of the headline
step, docs/benchmarks.md r4 day-2 campaign). Frames must be BITWISE
equal: each element evaluates the same expression tree, only the
intermediate layout differs. These tests pin that under jit on CPU —
where XLA's FMA contraction inside compiled code would expose any
expression-shape mismatch (CLAUDE.md: mul+sub contraction) — and at the
packed-row level for both layouts (plain 32-row and split 40-row, with
and without the prep-constants fast path).
"""

import jax
import numpy as np
import pytest

from madrona_renderer_tpu.config import (
    ImportedCamera, ImportedInstance, WorldInit,
)
from madrona_renderer_tpu.ops.raytrace_ref import build_world_soup
from madrona_renderer_tpu.ops.raytrace_pallas import (
    _pack_rows_planar, _pack_tris, _pack_tris_split, raytrace as rt_pal,
)

from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz


def _scene(n_worlds=4, textured=False):
    rng = np.random.default_rng(99)
    insts, cams, worlds = [], [], []
    for w in range(n_worlds):
        yaw = 0.37 * w
        insts.append(ImportedInstance(
            position=[float(rng.uniform(-2, 2)), float(8 + w),
                      float(rng.uniform(-2, 2))],
            rotation=[float(np.cos(yaw / 2)), 0.1, 0.0,
                      float(np.sin(yaw / 2))],
            scale=[1.0 + 0.1 * w, 0.9, 1.2],
            object_id=0,
        ))
        insts.append(ImportedInstance(
            position=[0, 0, 0], rotation=[1, 0, 0, 0],
            scale=[1, 1, 1], object_id=0,
        ))
        cams.append(cam_at_origin_looking_plus_y())
        worlds.append(WorldInit(num_instances=2, instance_offset=2 * w,
                                num_cameras=1, camera_offset=w))
    return build([quad_xz(half=20.0, y=0.0)], insts, cams, worlds)


@pytest.mark.parametrize("variant", ["plain", "split_raw", "split_prep"])
def test_pack_rows_bitwise(variant):
    state, scene = _scene()
    cam_pos = state.camera_pos[:, 0, :]

    @jax.jit
    def both(state, scene):
        soup = build_world_soup(state, scene)
        if variant == "plain":
            a = _pack_tris(soup, scene)
            b = _pack_rows_planar(state, scene)
        elif variant == "split_raw":
            a = _pack_tris_split(soup, scene)
            b = _pack_rows_planar(state, scene, split=True)
        else:
            a = _pack_tris_split(soup, scene, cam_pos=cam_pos)
            b = _pack_rows_planar(state, scene, cam_pos=cam_pos, split=True)
        return a, b

    a, b = both(state, scene)
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    # Bitwise: compare the raw float words, so -0.0 vs 0.0 or NaN
    # payload drift would fail too.
    np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))


def test_planar_frames_bitwise(monkeypatch):
    """Full kernel frames under the planar pack == under the soup pack."""
    state, scene = _scene()
    monkeypatch.setenv("MRT_PACK_PLANAR", "1")
    on = rt_pal(state, scene, height=32, width=64, interpret=True)
    monkeypatch.setenv("MRT_PACK_PLANAR", "0")
    off = rt_pal(state, scene, height=32, width=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(on.rgb), np.asarray(off.rgb))
    np.testing.assert_array_equal(np.asarray(on.depth),
                                  np.asarray(off.depth))
    np.testing.assert_array_equal(np.asarray(on.segmask),
                                  np.asarray(off.segmask))
    assert (np.asarray(on.segmask) >= 0).any()
