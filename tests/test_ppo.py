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


def test_warmstart_scan_frames_bitwise(setup):
    """The warm-start exactness guarantee through the rollout shape the
    PPO loop uses: a jitted lax.scan whose carry threads the previous
    step's depth into the next render. Every frame of the warm rollout
    must bitwise-equal the cold one (ops/warmstart.py, here covering the
    cond-inside-scan lowering)."""
    import dataclasses

    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace
    from madrona_renderer_tpu.ops.warmstart import raytrace_warmstart

    scene, state, _ = setup

    def mk(warm):
        def env_step(carry, _):
            st, prev = carry
            if warm:
                fr = raytrace_warmstart(
                    st, scene, prev_depth=prev, height=16, width=16)
            else:
                fr = raytrace(st, scene, height=16, width=16)
            st = dataclasses.replace(
                st, time=st.time + 0.05,
                camera_pos=st.camera_pos + jnp.float32(0.01))
            return (st, fr.depth), (fr.rgb, fr.depth, fr.segmask)

        @jax.jit
        def run(st):
            w, c = st.camera_pos.shape[:2]
            prev0 = jnp.zeros((w, c, 16, 16), jnp.float32)
            _, traj = jax.lax.scan(env_step, (st, prev0), None, length=3)
            return traj

        return run

    t_cold = mk(False)(jax.tree.map(jnp.array, state))
    t_warm = mk(True)(jax.tree.map(jnp.array, state))
    for name, a, b in zip(("rgb", "depth", "segmask"), t_cold, t_warm):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)


def test_warmstart_train_step_equivalent(setup):
    """PPOConfig(warmstart=True) trains the same policy as the cold
    rollout. The rendered trajectory is bitwise-identical (test above);
    the end-to-end comparison is allclose, not bitwise, because the two
    train steps are different XLA programs whose policy/grad reductions
    may associate differently (cross-program fp ordering)."""
    from functools import partial

    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    scene, state, ppo = setup
    ppo_small = ppo._replace(rollout_len=2)
    key = jax.random.PRNGKey(2)
    params0 = init_policy_params(ppo_small, key)

    cold = make_train_step(
        scene, ppo_small,
        render=partial(raytrace, height=ppo_small.height,
                       width=ppo_small.width))
    warm = make_train_step(scene, ppo_small._replace(warmstart=True))

    results = {}
    for name, ts in (("cold", cold), ("warm", warm)):
        st = jax.tree.map(jnp.array, state)  # fresh buffers (donation)
        p = jax.tree.map(jnp.array, params0)
        opt = ts.init_optimizer(p)
        p, opt, st, k, metrics = ts(p, opt, st, key)
        p, opt, st, k, metrics = ts(p, opt, st, k)
        results[name] = (p, metrics)
    for k2 in results["cold"][0]:
        np.testing.assert_allclose(
            np.asarray(results["cold"][0][k2]),
            np.asarray(results["warm"][0][k2]),
            rtol=1e-4, atol=1e-6, err_msg=k2)
    for k2, v in results["cold"][1].items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(results["warm"][1][k2]),
            rtol=1e-4, atol=1e-6, err_msg=k2)


def test_warmstart_render_override_conflict(setup):
    scene, _, ppo = setup
    with pytest.raises(ValueError, match="warmstart"):
        make_train_step(scene, ppo._replace(warmstart=True),
                        render=lambda s, sc: None)
