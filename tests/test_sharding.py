"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from madrona_renderer_tpu.config import RenderMode
from madrona_renderer_tpu.assets.importer import load_render_assets
from madrona_renderer_tpu.core.scene import bake_scene
from madrona_renderer_tpu.core.state import init_state
from madrona_renderer_tpu.parallel import (
    build_sharded_render,
    make_mesh,
    replicate_scene,
    shard_state,
)
from madrona_renderer_tpu.runners.scenes import demo_config


def _scene_state(num_worlds):
    cfg = demo_config(num_worlds, RenderMode.Raytracer, 16, 16, dynamic=True)
    assets = load_render_assets(
        cfg.rcfg.geo_cfg, cfg.rcfg.asset_paths, cfg.rcfg.additional_mats,
        cfg.rcfg.additional_textures,
    )
    return init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds), bake_scene(assets)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_worlds_dp_8_devices_matches_single_device():
    state, scene = _scene_state(16)
    # Single-device reference.
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace

    want = raytrace(state, scene, height=16, width=16)

    mesh = make_mesh(8, 1)
    sstate = shard_state(state, mesh)
    sscene = replicate_scene(scene, mesh)
    step = build_sharded_render(mesh, height=16, width=16, mode="rt", donate=False)
    _, frames = step(sstate, sscene)
    np.testing.assert_array_equal(np.asarray(frames.rgb), np.asarray(want.rgb))
    np.testing.assert_allclose(
        np.asarray(frames.depth), np.asarray(want.depth), rtol=1e-5, atol=1e-5
    )
    assert len(frames.rgb.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_2d_mesh_worlds_by_rows():
    state, scene = _scene_state(8)
    mesh = make_mesh(4, 2)
    sstate = shard_state(state, mesh)
    sscene = replicate_scene(scene, mesh)
    step = build_sharded_render(mesh, height=16, width=16, mode="rt", donate=False)
    state2, frames = step(sstate, sscene)
    assert frames.rgb.shape == (8, 1, 16, 16, 4)
    assert len(frames.rgb.sharding.device_set) == 8
    # Time advanced on every shard.
    np.testing.assert_allclose(np.asarray(state2.time), 0.05, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pallas_impl_under_sharding():
    """The Pallas kernel (interpret mode on CPU) runs under the sharded
    step and matches the jnp path."""
    state, scene = _scene_state(8)
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace

    want = raytrace(state, scene, height=16, width=16)
    mesh = make_mesh(8, 1)
    step = build_sharded_render(
        mesh, height=16, width=16, mode="rt", donate=False, impl="pallas"
    )
    _, frames = step(shard_state(state, mesh), replicate_scene(scene, mesh))
    diff = np.abs(
        np.asarray(frames.rgb).astype(np.int16) - np.asarray(want.rgb).astype(np.int16)
    )
    assert diff.max() <= 1
    assert len(frames.rgb.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_step_chain_keeps_sharding():
    state, scene = _scene_state(8)
    mesh = make_mesh(8, 1)
    sstate = shard_state(state, mesh)
    sscene = replicate_scene(scene, mesh)
    step = build_sharded_render(mesh, height=16, width=16, mode="rt")
    for _ in range(3):
        sstate, frames = step(sstate, sscene)
    assert len(sstate.instance_pos.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sstate.time), 0.15, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ray_axis_sharding_few_worlds_huge_view():
    """Few-worlds × big-view workloads shard the RAY axis, not worlds
    (docs/roadmap.md scaling row): a (worlds=1, rows=8) mesh splits each
    image into 8 pixel-row shards and must reproduce the single-device
    render exactly — the correctness half of the ray-axis sharding
    story; the pod-scale wall-clock half needs real multi-chip ICI."""
    state, scene = _scene_state(2)
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace

    want = raytrace(state, scene, height=64, width=64)

    mesh = make_mesh(1, 8)
    sstate = shard_state(state, mesh)
    sscene = replicate_scene(scene, mesh)
    step = build_sharded_render(mesh, height=64, width=64, mode="rt", donate=False)
    _, frames = step(sstate, sscene)
    np.testing.assert_array_equal(np.asarray(frames.rgb), np.asarray(want.rgb))
    np.testing.assert_allclose(
        np.asarray(frames.depth), np.asarray(want.depth), rtol=1e-5, atol=1e-5
    )
    assert len(frames.rgb.sharding.device_set) == 8
