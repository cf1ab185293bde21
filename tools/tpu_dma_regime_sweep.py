"""Cluster-size x bands x gates x supertile sweep on the 100k-tri terrain.

With scalar band gates the deferred sweep's compute no longer dominates
(bands 2/4/8 all ~95 f/s, kernel = 97% of step): the walk is bound by
the per-visit DMA stream (geo window switches + per-visit attr slabs).
This sweeps the knobs that change DMA volume/frequency: cluster size
(visits per window, attr DMAs per swept region), band count, gate kind,
and supertile budget.

Usage: python -u tools/tpu_dma_regime_sweep.py [--worlds 32] [--res 512]
       [--configs cs:bands:gates:st ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_binned_bench import build_scene, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=32)
    ap.add_argument("--grid", type=int, default=224)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--accel", default="binned")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument(
        "--configs", nargs="*",
        default=["32:8:1:4", "64:8:1:4", "128:8:1:4", "32:8:0:4",
                 "32:8:1:8"],
        help="cs:bands:gates:supertile",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    scenes = {}
    rollouts = {}
    for cfg in args.configs:
        cs, bands, gates, st_budget = cfg.split(":")
        os.environ["MRT_DMA_CLUSTER"] = cs
        os.environ["MRT_SWEEP_BANDS"] = bands
        os.environ["MRT_BAND_GATES"] = gates
        os.environ["MRT_SUPERTILE"] = st_budget
        if cs not in scenes:
            scenes[cs] = build_scene(args.worlds, args.grid)
        state0, scene = scenes[cs]

        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, sc, n, _cfg=cfg):
            def body(s, _):
                half = jnp.float32(0.01)
                dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                               jnp.float32)
                s = dataclasses.replace(
                    s, time=s.time + 0.05,
                    instance_rot=quat_normalize(
                        quat_multiply(dq, s.instance_rot)),
                )
                f = raytrace(s, sc, height=args.res, width=args.res,
                             accel=args.accel)
                return s, f.rgb
            s, stack = jax.lax.scan(body, st, None, length=n)
            return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

        log(f"cfg cs:bands:gates:st={cfg}: compiling + warming...")
        st = jax.tree.map(jnp.copy, state0)
        for n in (2, 6):
            st, ck = rollout(st, scene, n)
            float(np.asarray(ck))
        rollouts[cfg] = rollout

    results = {c: [] for c in args.configs}
    for rnd in range(args.rounds):
        for cfg in args.configs:
            cs = cfg.split(":")[0]
            state0, scene = scenes[cs]
            rollout = rollouts[cfg]
            st = jax.tree.map(jnp.copy, state0)
            st, ck = rollout(st, scene, 2)
            float(np.asarray(ck))
            t0 = time.perf_counter()
            st, ck = rollout(st, scene, 2)
            float(np.asarray(ck))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            st, ck = rollout(st, scene, 6)
            float(np.asarray(ck))
            tb = time.perf_counter() - t0
            per = (tb - ts) / 4
            if per <= 0:
                per = tb / 6
            results[cfg].append(args.worlds / per)
            log(f"round {rnd} {cfg}: {args.worlds/per:,.1f} f/s "
                f"({per*1e3:.2f} ms/step)")
    for cfg in args.configs:
        vals = sorted(results[cfg])
        med = vals[len(vals) // 2] if len(vals) % 2 else (
            0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
        )
        log(f"MEDIAN {cfg}: {med:,.1f} f/s over {vals}")
    log("DONE")


if __name__ == "__main__":
    main()
