"""Compare raytrace accel modes (clusters vs mxu) on the real TPU.

One client process, flush-immediate logging (axon tunnel discipline — see
tools/tpu_bench_session.py). Times the north-star configs:
  4096w x 64x64 and 4096w x 128x128, RGB-D raytrace, demo scene.

Usage: python -u tools/tpu_accel_compare.py [--worlds 4096]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--res", type=int, nargs="*", default=[64, 128])
    ap.add_argument("--accel", nargs="*", default=["auto", "mxu"])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")

    from bench import build
    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    for res in args.res:
        state0, scene, cfg = build(args.worlds, "rt", res, res, "pallas")
        for accel in args.accel:
            @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
            def rollout(state, scene, n, _accel=accel, _res=res):
                def body(st, _):
                    half = jnp.float32(0.015)
                    dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                                   jnp.float32)
                    st = dataclasses.replace(
                        st,
                        time=st.time + 0.05,
                        instance_rot=quat_normalize(
                            quat_multiply(dq, st.instance_rot)),
                    )
                    frames = raytrace(st, scene, height=_res, width=_res,
                                      near=cfg.near_plane, far=cfg.far_plane,
                                      accel=_accel)
                    return st, frames.rgb
                st, stack = jax.lax.scan(body, state, None, length=n)
                return st, jnp.sum(stack[:, 0].astype(jnp.int32))

            n_small = max(2, args.steps // 4)
            n_big = args.steps
            state = jax.tree.map(jnp.copy, state0)
            log(f"res={res} accel={accel}: compiling...")
            state, ck = rollout(state, scene, n_small)
            float(np.asarray(ck))
            state, ck = rollout(state, scene, n_big)
            float(np.asarray(ck))
            t0 = time.perf_counter()
            state, ck = rollout(state, scene, n_small)
            float(np.asarray(ck))
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, ck = rollout(state, scene, n_big)
            float(np.asarray(ck))
            t_big = time.perf_counter() - t0
            per_step = (t_big - t_small) / (n_big - n_small)
            if per_step <= 0:
                per_step = t_big / n_big
            fps = args.worlds / per_step
            log(f"res={res} accel={accel}: {fps:,.0f} f/s "
                f"({per_step*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
