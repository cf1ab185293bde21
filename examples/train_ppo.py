"""Train a visual PPO policy with rendered observations streaming on-device.

BASELINE config 5 ("worlds streaming zero-copy pixels into a JAX PPO loop")
as a runnable example:

    python examples/train_ppo.py --worlds 1024 --updates 50 [--res 64]
"""

import argparse
import os
import sys
import time

# Runnable without an editable install: `python examples/train_ppo.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=256)
    ap.add_argument("--updates", type=int, default=20)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--rollout", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--entropy-coef", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--warmstart", action="store_true",
                    help="temporal depth warm-start inside the rollout "
                    "scan (bitwise-identical frames, ops/warmstart.py)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                    "ignores JAX_PLATFORMS=cpu; this is the reliable "
                    "way to keep a smoke run off a shared single-client "
                    "TPU tunnel)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from madrona_renderer_tpu.config import RenderMode
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.rl.ppo import PPOConfig, init_policy_params, make_train_step
    from madrona_renderer_tpu.runners.scenes import demo_config

    cfg = demo_config(args.worlds, RenderMode.Raytracer, args.res, args.res, dynamic=True)
    assets = load_render_assets(
        cfg.rcfg.geo_cfg, cfg.rcfg.asset_paths, cfg.rcfg.additional_mats,
        cfg.rcfg.additional_textures,
    )
    scene = bake_scene(assets)
    state = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)

    ppo = PPOConfig(height=args.res, width=args.res, rollout_len=args.rollout,
                    lr=args.lr, entropy_coef=args.entropy_coef,
                    warmstart=args.warmstart)
    key = jax.random.PRNGKey(args.seed)
    params = init_policy_params(ppo, key)
    train_step = make_train_step(scene, ppo)
    opt_state = train_step.init_optimizer(params)

    # Warmup/compile.
    params, opt_state, state, key, metrics = train_step(params, opt_state, state, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for u in range(args.updates):
        params, opt_state, state, key, metrics = train_step(params, opt_state, state, key)
        if (u + 1) % 10 == 0 or u == 0:
            print(
                f"update {u + 1}: reward={float(metrics['mean_reward']):.4f} "
                f"loss={float(metrics['loss']):.4f} entropy={float(metrics['entropy']):.3f}"
            )
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    frames = args.updates * (args.rollout + 1) * args.worlds  # renders per update
    print(
        f"{args.updates} updates in {dt:.2f}s — "
        f"{frames / dt:,.0f} rendered frames/sec into training"
    )


if __name__ == "__main__":
    main()
