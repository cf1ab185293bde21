"""Band-count x scalar-gates A/B on the 100k-tri terrain (512x512).

The r3 banded deferred sweep measured bands 1/2/4/8 ->
75.8/86.1/74.0/43.8 f/s: the per-(cluster, band) vector slab tests and
jnp.any occlusion checks (each a vector->scalar sync) eat the extra
halving past 2 bands. MRT_BAND_GATES replaces both with scalar gates
(pack-time row spans + carried per-band occlusion bounds), which should
move the optimum band count up. This sweeps (bands, gates) pairs in
interleaved rounds (tunnel variance is +-10%; trust cross-round medians).

Usage: python -u tools/tpu_band_ab.py [--worlds 32] [--grid 224]
       [--res 512] [--configs 2:0 2:1 4:1 8:1]
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
        "--configs", nargs="*", default=["2:0", "2:1", "4:1", "8:1"],
        help="bands:gates pairs",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    state0, scene = build_scene(args.worlds, args.grid)
    rollouts = {}
    for cfg in args.configs:
        bands, gates = cfg.split(":")
        os.environ["MRT_SWEEP_BANDS"] = bands
        os.environ["MRT_BAND_GATES"] = gates

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

        log(f"cfg bands:gates={cfg}: compiling + warming...")
        st = jax.tree.map(jnp.copy, state0)
        for n in (2, 6):
            st, ck = rollout(st, scene, n)
            float(np.asarray(ck))
        rollouts[cfg] = rollout

    results = {c: [] for c in args.configs}
    for rnd in range(args.rounds):
        for cfg in args.configs:
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
            log(f"round {rnd} bands:gates={cfg}: "
                f"{args.worlds/per:,.1f} f/s ({per*1e3:.2f} ms/step)")
    for cfg in args.configs:
        vals = sorted(results[cfg])
        med = vals[len(vals) // 2] if len(vals) % 2 else (
            0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
        )
        log(f"MEDIAN bands:gates={cfg}: {med:,.1f} f/s over {vals}")
    log("DONE")


if __name__ == "__main__":
    main()
