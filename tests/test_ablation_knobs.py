"""Debug cost-ablation knobs (MRT_ABLATE_*, raytrace_pallas.py).

The knobs exist so tools/tpu_pixel_cost_probe runs can measure each
per-pixel pipeline stage's share of the step time on hardware (the only
way to profile inside one fused Pallas kernel). Their outputs are
deliberately wrong — these tests pin the *scope* of each knob: which
outputs it corrupts and, crucially, which it must leave bitwise intact,
so a probe's variant kernels are guaranteed to still run the stages it
thinks it is timing.
"""

import jax
import numpy as np
import pytest

from madrona_renderer_tpu.config import ImportedInstance
from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as rt_pal

from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz


@pytest.fixture(autouse=True)
def _fresh_traces():
    """Env knobs are read at trace time; a same-shape render from an
    earlier test (or this test's baseline) would otherwise be served
    from the trace cache with the OLD knob values baked in."""
    jax.clear_caches()
    yield
    jax.clear_caches()


def _set(monkeypatch, knob):
    monkeypatch.setenv(knob, "1")
    jax.clear_caches()


@pytest.fixture(scope="module")
def scene():
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [
            ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=0),
            ImportedInstance(position=[0, 5, 0], rotation=[1, 0, 0, 0],
                             scale=[0.05, 1, 0.05], object_id=0),
        ],
        [cam_at_origin_looking_plus_y()],
    )
    return state, scene


def _render(state, scene):
    return rt_pal(state, scene, height=32, width=32, interpret=True)


def test_ablate_shade_keeps_geometry_outputs(scene, monkeypatch):
    base = _render(*scene)
    _set(monkeypatch, "MRT_ABLATE_SHADE")
    got = _render(*scene)
    np.testing.assert_array_equal(np.asarray(got.depth), np.asarray(base.depth))
    np.testing.assert_array_equal(np.asarray(got.segmask), np.asarray(base.segmask))
    # Lighting removed (s=1 everywhere) — lit pixels change.
    assert (np.asarray(got.rgb) != np.asarray(base.rgb)).any()


def test_ablate_pack_keeps_geometry_outputs(scene, monkeypatch):
    base = _render(*scene)
    _set(monkeypatch, "MRT_ABLATE_PACK")
    got = _render(*scene)
    np.testing.assert_array_equal(np.asarray(got.depth), np.asarray(base.depth))
    np.testing.assert_array_equal(np.asarray(got.segmask), np.asarray(base.segmask))
    assert (np.asarray(got.rgb) != np.asarray(base.rgb)).any()


def test_ablate_resolve_keeps_winner_outputs(scene, monkeypatch):
    base = _render(*scene)
    _set(monkeypatch, "MRT_ABLATE_RESOLVE")
    got = _render(*scene)
    # The resolve only fills winner *attributes*; the sweep's t/idx stand.
    np.testing.assert_array_equal(np.asarray(got.depth), np.asarray(base.depth))
    np.testing.assert_array_equal(np.asarray(got.segmask), np.asarray(base.segmask))
    assert (np.asarray(got.rgb) != np.asarray(base.rgb)).any()


def test_ablate_sweep_all_miss(scene, monkeypatch):
    base = _render(*scene)
    assert np.asarray(base.depth).max() > 0  # scene actually hits
    _set(monkeypatch, "MRT_ABLATE_SWEEP")
    got = _render(*scene)
    assert np.asarray(got.depth).max() == 0.0
    assert (np.asarray(got.segmask) == -1).all()  # the miss sentinel


def test_ablate_raygen_runs(scene, monkeypatch):
    base = _render(*scene)
    _set(monkeypatch, "MRT_ABLATE_RAYGEN")
    got = _render(*scene)
    assert np.asarray(got.rgb).shape == np.asarray(base.rgb).shape
    # Constant forward ray: every pixel in a row traces the same ray, so
    # the image collapses to (at most) per-tile-constant values — i.e.
    # the per-pixel NDC math really is gone from the traced kernel.
    d = np.asarray(got.depth)
    assert np.unique(d).size <= 4
