"""PPO streaming-loop test: frames → policy → update, fully jitted."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_renderer_tpu.config import RenderMode
from madrona_renderer_tpu.assets.importer import load_render_assets
from madrona_renderer_tpu.core.scene import bake_scene
from madrona_renderer_tpu.core.state import init_state
from madrona_renderer_tpu.rl.ppo import PPOConfig, init_policy_params, make_train_step
from madrona_renderer_tpu.runners.scenes import demo_config


@pytest.fixture
def setup():
    # Function-scoped: train_step donates sim_state, so each test needs a
    # fresh one.
    cfg = demo_config(8, RenderMode.Raytracer, 16, 16, dynamic=True)
    assets = load_render_assets(
        cfg.rcfg.geo_cfg, cfg.rcfg.asset_paths, cfg.rcfg.additional_mats,
        cfg.rcfg.additional_textures,
    )
    scene = bake_scene(assets)
    state = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)
    ppo = PPOConfig(height=16, width=16, rollout_len=4, pool=4)
    return scene, state, ppo


def test_train_step_runs_and_updates(setup):
    scene, state, ppo = setup
    key = jax.random.PRNGKey(0)
    params = init_policy_params(ppo, key)
    train_step = make_train_step(scene, ppo)
    opt_state = train_step.init_optimizer(params)

    p0 = np.asarray(params["w_pi"]).copy()
    metrics = None
    for _ in range(2):
        params, opt_state, state, key, metrics = train_step(
            params, opt_state, state, key
        )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert (np.asarray(params["w_pi"]) != p0).any(), "params did not update"
    # Env actually advanced (2 updates × 4 rollout steps × 0.05).
    np.testing.assert_allclose(np.asarray(state.time), 0.4, atol=1e-5)


def test_reward_signal_nonzero(setup):
    """The demo scene's cube is visible from the start → nonzero reward."""
    scene, state, ppo = setup
    key = jax.random.PRNGKey(1)
    params = init_policy_params(ppo, key)
    train_step = make_train_step(scene, ppo)
    opt_state = train_step.init_optimizer(params)
    _, _, _, _, metrics = train_step(params, opt_state, state, key)
    assert float(metrics["mean_reward"]) > 0.0
