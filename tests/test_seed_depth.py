"""Per-pixel best_t seeding (experimental input, VERDICT r3 #3).

Seeding the search window with a valid upper bound must be a pure
no-op on the output: same winner, bitwise-identical frames. Seeding
below the true hit turns pixels into documented misses.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from madrona_renderer_tpu.ops.raytrace_pallas import raytrace


@pytest.fixture(scope="module")
def terrain():
    from tpu_binned_bench import build_scene

    return build_scene(2, 48)


@pytest.mark.parametrize("accel,res", [
    ("binned", 128),   # 2D tiles + bins (the terrain production path)
    ("clusters", 64),  # ordered DMA path
    ("none", 64),      # resident sweep (small demo scene)
])
def test_exact_seed_is_bitwise_noop(terrain, accel, res):
    if accel == "none":
        from bench import build

        state, scene, _ = build(4, "rt", res, res, "pallas")
    else:
        state, scene = terrain
    f0 = raytrace(state, scene, height=res, width=res, accel=accel)
    seed = jnp.asarray(np.asarray(f0.depth)) * 1.0001
    f1 = raytrace(state, scene, height=res, width=res, accel=accel,
                  seed_t=seed)
    np.testing.assert_array_equal(np.asarray(f0.rgb), np.asarray(f1.rgb))
    np.testing.assert_array_equal(np.asarray(f0.depth), np.asarray(f1.depth))
    np.testing.assert_array_equal(np.asarray(f0.segmask),
                                  np.asarray(f1.segmask))


def test_far_seed_is_bitwise_noop(terrain):
    state, scene = terrain
    f0 = raytrace(state, scene, height=128, width=128, accel="binned")
    seed = jnp.full((2, 1, 128, 128), 1000.0, jnp.float32)
    f1 = raytrace(state, scene, height=128, width=128, accel="binned",
                  seed_t=seed)
    np.testing.assert_array_equal(np.asarray(f0.rgb), np.asarray(f1.rgb))


def test_undershooting_seed_documented_miss(terrain):
    state, scene = terrain
    f0 = raytrace(state, scene, height=128, width=128, accel="binned")
    hit0 = np.asarray(f0.segmask) >= 0
    assert hit0.any()
    seed = jnp.asarray(np.asarray(f0.depth)) * 0.5  # below every true hit
    f1 = raytrace(state, scene, height=128, width=128, accel="binned",
                  seed_t=seed)
    hit1 = np.asarray(f1.segmask) >= 0
    assert not hit1[hit0].any()  # every seeded-under pixel decodes as miss


def test_seed_rejected_on_mxu(terrain):
    state, scene = terrain
    seed = jnp.full((2, 1, 64, 64), 1000.0, jnp.float32)
    with pytest.raises(ValueError, match="mxu"):
        raytrace(state, scene, height=64, width=64, accel="mxu",
                 seed_t=seed)
