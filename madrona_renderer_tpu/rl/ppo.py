"""Visual-RL integration: PPO training loop streaming rendered observations.

The reference exists to feed batch-rendered observations into RL training
(its smoke test consumes tensors from torch — ``scripts/test.py:137-151``;
the Manager docs call the consumer "the training code", ``src/mgr.hpp:22-28``).
This module is the TPU-native version of that integration, and the target
of BASELINE.json config 5 (worlds streaming zero-copy pixels into a JAX PPO
loop): **the renderer runs inside the jitted train step** — rollout
(render → policy → transition), GAE, and the clipped-PPO update are one XLA
program; pixels never leave the device.

The built-in task ("spin-to-see"): each world's agent yaws its camera left/
right/none; reward is the fraction of pixels covering instance 0. It is
deliberately trivial — the point is the plumbing and its throughput, not
the task.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scene import SceneData
from ..core.state import SimState
from ..ops.quat import quat_multiply, quat_normalize


class PPOConfig(NamedTuple):
    height: int = 64
    width: int = 64
    rollout_len: int = 8
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    yaw_step: float = 0.1
    pool: int = 4  # obs downsample factor
    hidden: int = 128
    # Temporal depth warm-start inside the rollout scan (ops/warmstart.py):
    # each env step seeds its ray search windows from the previous step's
    # depth carried through the scan — bitwise-equal training trajectory
    # (warm starts are correctness-independent of their seed). Pallas
    # raytracer only; incompatible with a caller-provided render.
    warmstart: bool = False


N_ACTIONS = 3  # yaw -1 / 0 / +1


def init_policy_params(cfg: PPOConfig, key: jax.Array) -> Dict[str, Any]:
    obs_dim = (cfg.height // cfg.pool) * (cfg.width // cfg.pool)
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / np.sqrt(obs_dim)
    return {
        "w1": jax.random.normal(k1, (obs_dim, cfg.hidden)) * scale,
        "b1": jnp.zeros((cfg.hidden,)),
        "w_pi": jax.random.normal(k2, (cfg.hidden, N_ACTIONS)) * 0.01,
        "b_pi": jnp.zeros((N_ACTIONS,)),
        "w_v": jax.random.normal(k3, (cfg.hidden, 1)) * 0.01,
        "b_v": jnp.zeros((1,)),
    }


def _obs_from_frames(rgb: jnp.ndarray, cfg: PPOConfig) -> jnp.ndarray:
    """u8 [W, C, H, Wd, 4] → f32 [W, obs_dim] (gray, avg-pooled, cam 0).
    Stays on device — the zero-copy handoff. Channels are sliced
    separately: a materialized f32[..., 3] would tile-pad its minor dim
    3 → 128 lanes (measured OOM at 16k worlds)."""
    packed = jax.lax.bitcast_convert_type(rgb[:, 0], jnp.uint32)  # [W, H, Wd]
    r = (packed & 0xFF).astype(jnp.float32)
    g = ((packed >> 8) & 0xFF).astype(jnp.float32)
    b = ((packed >> 16) & 0xFF).astype(jnp.float32)
    gray = (r + g + b) * (1.0 / (3.0 * 255.0))  # [W, H, Wd]
    w, h, wd = gray.shape
    p = cfg.pool
    pooled = gray.reshape(w, h // p, p, wd // p, p).mean((2, 4))
    return pooled.reshape(w, -1)


def policy_apply(params, obs: jnp.ndarray):
    h = jnp.tanh(obs @ params["w1"] + params["b1"])
    logits = h @ params["w_pi"] + params["b_pi"]
    value = (h @ params["w_v"] + params["b_v"])[..., 0]
    return logits, value


def _apply_action(state: SimState, action: jnp.ndarray, cfg: PPOConfig) -> SimState:
    """Discrete yaw action per world applied to camera 0's rotation."""
    yaw = (action.astype(jnp.float32) - 1.0) * cfg.yaw_step  # [-s, 0, +s]
    half = yaw * 0.5
    dq = jnp.stack(
        [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)],
        axis=-1,
    )  # [W, 4] rotation about world Z
    cam_rot = state.camera_rot
    # Renormalize: fp32 error random-walks over long training runs.
    new0 = quat_normalize(quat_multiply(dq, cam_rot[:, 0, :]))
    cam_rot = cam_rot.at[:, 0, :].set(new0)
    return dataclasses.replace(state, camera_rot=cam_rot)


def _reward(segmask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of camera-0 pixels seeing instance 0."""
    return (segmask[:, 0] == 0).mean(axis=(-1, -2)).astype(jnp.float32)


def make_train_step(
    scene: SceneData,
    cfg: PPOConfig,
    render: Callable | None = None,
) -> Callable:
    """Build the jitted train step:
    (params, opt_state, sim_state, key) → (params, opt_state, sim_state,
    key, metrics). One call = rollout_len rendered env steps + one PPO
    update, all on device."""
    import optax

    if cfg.warmstart:
        if render is not None:
            raise ValueError(
                "PPOConfig.warmstart=True builds its own warm-started "
                "Pallas render — drop the render= override")
        # The seeded search window is a Pallas kernel feature
        # (ops/warmstart.py); the previous step's depth rides the scan
        # carry, so the whole warm-started rollout stays one XLA program.
        from ..ops.warmstart import raytrace_warmstart

        def render(sim_state, scene, *, prev_depth):
            return raytrace_warmstart(
                sim_state, scene, prev_depth=prev_depth,
                height=cfg.height, width=cfg.width)
    elif render is None:
        if jax.default_backend() in ("tpu", "axon"):
            from ..ops.raytrace_pallas import raytrace
        else:
            from ..ops.raytrace_ref import raytrace

        base = partial(raytrace, height=cfg.height, width=cfg.width)

        def render(sim_state, scene, *, prev_depth=None):
            return base(sim_state, scene)
    else:
        _user_render = render

        def render(sim_state, scene, *, prev_depth=None):
            return _user_render(sim_state, scene)

    optimizer = optax.adam(cfg.lr)

    def env_step(carry, key):
        # One render per step: this frame provides the observation for the
        # current action AND the reward for the previous one (rewards are
        # shifted by one step when assembling the trajectory below).
        sim_state, params, prev_depth = carry
        frames = render(sim_state, scene, prev_depth=prev_depth)
        obs = _obs_from_frames(frames.rgb, cfg)
        reward_prev = _reward(frames.segmask)
        logits, value = policy_apply(params, obs)
        action = jax.random.categorical(key, logits)
        logp = jax.nn.log_softmax(logits)[jnp.arange(obs.shape[0]), action]
        sim_state = _apply_action(sim_state, action, cfg)
        sim_state = dataclasses.replace(sim_state, time=sim_state.time + 0.05)
        # Non-warm runs carry an inert scalar instead of the depth map so
        # the scan carry stays free when the tier is off.
        next_prev = frames.depth if cfg.warmstart else prev_depth
        return ((sim_state, params, next_prev),
                (obs, action, logp, value, reward_prev))

    def gae(rewards, values, last_value):
        def scan_fn(adv, t):
            r, v, v_next = t
            delta = r + cfg.gamma * v_next - v
            adv = delta + cfg.gamma * cfg.gae_lambda * adv
            return adv, adv

        v_next = jnp.concatenate([values[1:], last_value[None]], axis=0)
        _, advs = jax.lax.scan(
            scan_fn,
            jnp.zeros_like(last_value),
            (rewards, values, v_next),
            reverse=True,
        )
        return advs, advs + values

    def loss_fn(params, obs, action, old_logp, adv, returns):
        logits, value = policy_apply(params, obs)
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, action[..., None], axis=-1)[..., 0]
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n,
        ).mean()
        v_loss = ((value - returns) ** 2).mean()
        entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
        total = pg + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
        return total, (pg, v_loss, entropy)

    @partial(jax.jit, donate_argnums=(2,))
    def train_step(params, opt_state, sim_state, key):
        key, *step_keys = jax.random.split(key, cfg.rollout_len + 1)
        if cfg.warmstart:
            # Zeros map to `far` inside raytrace_warmstart — the first
            # rollout step renders cold, the rest seed temporally.
            w, c = sim_state.camera_pos.shape[:2]
            prev0 = jnp.zeros((w, c, cfg.height, cfg.width), jnp.float32)
        else:
            prev0 = jnp.float32(0.0)
        (sim_state, _, prev_depth), traj = jax.lax.scan(
            env_step, (sim_state, params, prev0), jnp.stack(step_keys)
        )
        obs, action, logp, value, reward_prev = traj  # each [T, W, ...]
        frames = render(sim_state, scene, prev_depth=prev_depth)
        final_obs = _obs_from_frames(frames.rgb, cfg)
        _, last_value = policy_apply(params, final_obs)
        # reward_prev[t] is the reward observed AT step t (i.e. for action
        # t-1); the reward for action t is reward_prev[t+1], with the final
        # render supplying the last one.
        final_reward = _reward(frames.segmask)
        reward = jnp.concatenate([reward_prev[1:], final_reward[None]], axis=0)
        adv, returns = gae(reward, value, last_value)

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        (loss, (pg, v_loss, ent)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, flat(obs), flat(action), flat(logp), flat(adv), flat(returns)
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "pg_loss": pg,
            "value_loss": v_loss,
            "entropy": ent,
            "mean_reward": reward.mean(),
        }
        return params, opt_state, sim_state, key, metrics

    def init_optimizer(params):
        return optimizer.init(params)

    train_step.init_optimizer = init_optimizer
    return train_step
