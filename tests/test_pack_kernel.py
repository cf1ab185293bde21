"""Fused Pallas pack kernel ↔ XLA planar pack bitwise parity.

The pack kernel (ops/pack_pallas.py) replaces the XLA gather-based
input pack (~15% of the headline step, r4 chainK probe) with a Pallas
kernel that rebuilds the packed rows from per-instance scalars and
bake-expanded object planes. Real lanes must be BITWISE equal to
``_pack_rows_planar`` for every variant (plain / split raw / split
prep / uv_defer mirror), and the zero pad lanes must really be zero
(the render path treats them as semantically inert). Scenes here use
MULTIPLE objects (exercising the unrolled select-gather), non-uniform
scales (the XLA-side inverse-scale rows), invalid instance slots, and
textures (the density/color planes).

Reference anchor: the per-step render-ECS instance gather the pack
re-creates (``RenderingSystem::setupTasks``, reference
``src/sim.cpp:122-126``).
"""

import jax
import numpy as np
import pytest

from madrona_renderer_tpu.config import (
    ImportedCamera, ImportedInstance, WorldInit,
)
from madrona_renderer_tpu.ops.pack_pallas import pack_rows_pallas
from madrona_renderer_tpu.ops.raytrace_pallas import (
    _pack_rows_planar, raytrace as rt_pal,
)

from tests.helpers import (
    build, cam_at_origin_looking_plus_y, quad_uvs, quad_xz,
)


def _tri_mesh():
    return np.asarray(
        [[-1.0, 0.0, -1.0], [1.0, 0.0, -1.0], [0.0, 0.0, 1.5]], np.float32
    )


def _scene(n_worlds=4, textured=False):
    """Two object types (quad + lone triangle), ragged instance lists
    (world w uses 2 or 3 of the 3 slots), rotated/scaled instances."""
    rng = np.random.default_rng(7)
    insts, cams, worlds = [], [], []
    for w in range(n_worlds):
        yaw = 0.53 * w + 0.2
        insts.append(ImportedInstance(
            position=[float(rng.uniform(-2, 2)), float(7 + w),
                      float(rng.uniform(-2, 2))],
            rotation=[float(np.cos(yaw / 2)), 0.0, 0.1,
                      float(np.sin(yaw / 2))],
            scale=[1.0 + 0.2 * w, 0.8, 1.3],
            object_id=w % 2,
        ))
        insts.append(ImportedInstance(
            position=[0, 10, 0], rotation=[1, 0, 0, 0],
            scale=[2.0, 1.0, 0.5], object_id=1,
        ))
        insts.append(ImportedInstance(
            position=[1, 9, -1], rotation=[1, 0, 0, 0],
            scale=[1, 1, 1], object_id=0,
        ))
        cams.append(cam_at_origin_looking_plus_y())
        worlds.append(WorldInit(
            num_instances=2 + w % 2, instance_offset=3 * w,
            num_cameras=1, camera_offset=w,
        ))
    kw = {}
    if textured:
        checker = np.zeros((8, 8, 4), np.uint8)
        checker[::2, ::2] = 255
        checker[1::2, 1::2] = 255
        checker[..., 3] = 255
        from madrona_renderer_tpu.config import AdditionalMaterial

        kw = dict(
            uvs=[quad_uvs(), np.zeros((3, 2), np.float32)],
            mesh_materials=[0, -1],
            additional_mats=[AdditionalMaterial(
                color=[1.0, 1.0, 1.0, 1.0], texture_id=0)],
            texture_images=[checker],
        )
    return build([quad_xz(half=6.0, y=0.0), _tri_mesh()],
                 insts, cams, worlds, **kw)


@pytest.mark.parametrize("textured", [False, True])
@pytest.mark.parametrize(
    "variant", ["plain", "split_raw", "split_prep", "split_uvdefer"]
)
def test_pack_kernel_bitwise(variant, textured):
    state, scene = _scene(textured=textured)
    cam_pos = state.camera_pos[:, 0, :]
    S = state.instance_obj.shape[1] * scene.tris_per_object

    @jax.jit
    def both(state, scene):
        if variant == "plain":
            a = _pack_rows_planar(state, scene)
            b = pack_rows_pallas(state, scene, interpret=True)
            return (a,), (b,)
        cp = None if variant == "split_raw" else cam_pos
        a = _pack_rows_planar(state, scene, cam_pos=cp, split=True)
        uvd = variant == "split_uvdefer"
        geo, attrs = pack_rows_pallas(
            state, scene, cam_pos=cp, split=True, uv_defer=uvd,
            interpret=True,
        )
        ref_attr = a[:, 16:]
        if uvd:
            ref_attr = jax.numpy.concatenate([ref_attr, a[:, 0:10]], axis=1)
        return (a[:, :16], ref_attr), (geo, attrs)

    refs, kerns = both(state, scene)
    for ref, kern in zip(refs, kerns):
        ref, kern = np.asarray(ref), np.asarray(kern)
        assert kern.shape[2] % 128 == 0 and kern.shape[2] >= S
        # Real lanes: bitwise (raw int32 words — -0.0/NaN drift fails).
        np.testing.assert_array_equal(
            ref.view(np.int32), kern[:, :, :S].view(np.int32)
        )
        # Pad lanes: exact zeros (semantically inert for the render
        # kernels' unpadded loop bounds).
        assert not kern[:, :, S:].any()


def test_pack_kernel_frames_bitwise(monkeypatch):
    """Full kernel frames under the pack kernel == under the XLA pack."""
    state, scene = _scene()
    monkeypatch.setenv("MRT_PACK_KERNEL", "1")
    on = rt_pal(state, scene, height=32, width=64, interpret=True)
    monkeypatch.setenv("MRT_PACK_KERNEL", "0")
    off = rt_pal(state, scene, height=32, width=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(on.rgb), np.asarray(off.rgb))
    np.testing.assert_array_equal(np.asarray(on.depth),
                                  np.asarray(off.depth))
    np.testing.assert_array_equal(np.asarray(on.segmask),
                                  np.asarray(off.segmask))
    assert (np.asarray(on.segmask) >= 0).any()


def test_pack_select_bitwise(monkeypatch):
    """MRT_PACK_SELECT (XLA gather → unrolled select) is bitwise: each
    lane copies one operand, so values are identical to the gather."""
    state, scene = _scene(textured=True)
    cam_pos = state.camera_pos[:, 0, :]

    def packs():
        @jax.jit
        def f(state, scene):
            return (
                _pack_rows_planar(state, scene),
                _pack_rows_planar(state, scene, cam_pos=cam_pos,
                                  split=True),
            )

        return [np.asarray(x) for x in f(state, scene)]

    monkeypatch.setenv("MRT_PACK_SELECT", "1")
    on = packs()
    monkeypatch.setenv("MRT_PACK_SELECT", "0")
    off = packs()
    for a, b in zip(on, off):
        np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))


def test_pack_kernel_gate():
    """The MRT_PACK_KERNEL gate: off by default, bounded unrolls."""
    import os

    from madrona_renderer_tpu.ops.pack_pallas import pack_kernel_wanted

    state, scene = _scene(n_worlds=1)
    assert os.environ.get("MRT_PACK_KERNEL", "0") == "0"
    assert not pack_kernel_wanted(scene, 3)
    os.environ["MRT_PACK_KERNEL"] = "1"
    try:
        assert pack_kernel_wanted(scene, 3)
        assert not pack_kernel_wanted(scene, 65)  # I unroll bound
    finally:
        del os.environ["MRT_PACK_KERNEL"]
