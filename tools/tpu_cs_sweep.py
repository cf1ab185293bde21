"""Cluster-size sweep on the 100k-tri terrain with window-reuse DMA.

Window reuse (r3) made small clusters DMA-free (8/16/32-tri clusters
share one 128-lane slab), so the old cs=32 optimum may have moved:
smaller clusters cut swept pairs per visited cluster at the price of
more visit-loop iterations. Sweeps MRT_DMA_CLUSTER x MRT_DEFERRED_MXU.

Usage: python -u tools/tpu_cs_sweep.py [--worlds 32] [--res 512]
       [--cs 8 16 32] [--dmxu 0 1]
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
    ap.add_argument("--cs", type=int, nargs="*", default=[16, 32])
    ap.add_argument("--dmxu", nargs="*", default=["0", "1"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    for cs in args.cs:
        os.environ["MRT_DMA_CLUSTER"] = str(cs)
        state0, scene = build_scene(args.worlds, args.grid)
        cc = state0.instance_obj.shape[1] * scene.cl_valid.shape[1]
        log(f"cs={cs}: {cc} clusters/world")
        for dmxu in args.dmxu:
            os.environ["MRT_DEFERRED_MXU"] = dmxu

            @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
            def rollout(st, sc, n, _cs=cs, _d=dmxu):
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

            st = jax.tree.map(jnp.copy, state0)
            log(f"cs={cs} dmxu={dmxu}: compiling...")
            n_small, n_big = 2, 6
            st, ck = rollout(st, scene, n_small)
            float(np.asarray(ck))
            st, ck = rollout(st, scene, n_big)
            float(np.asarray(ck))
            t0 = time.perf_counter()
            st, ck = rollout(st, scene, n_small)
            float(np.asarray(ck))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            st, ck = rollout(st, scene, n_big)
            float(np.asarray(ck))
            tb = time.perf_counter() - t0
            per = (tb - ts) / (n_big - n_small)
            if per <= 0:
                per = tb / n_big
            log(f"cs={cs} dmxu={dmxu}: {args.worlds/per:,.1f} f/s "
                f"({per*1e3:.2f} ms/step)")
    log("DONE")


if __name__ == "__main__":
    main()
