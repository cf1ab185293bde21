"""Deferred-MXU A/B on the 100k-tri terrain (round-3 scale frontier).

Measures the deferred sweep with MRT_DEFERRED_MXU toggled 0/1 on the
same scene/resolution, plus an on-chip correctness diff between the two
(the dmxu numerators ride the MXU, so the contract is near-exact, not
bitwise — this prints the actual max LSB diff).

One client process, flush-immediate logging (axon tunnel discipline).
Usage: python -u tools/tpu_dmxu_bench.py [--worlds 32] [--grid 224]
       [--res 512] [--accel binned]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    state0, scene = build_scene(args.worlds, args.grid)
    S = state0.instance_obj.shape[1] * scene.tris_per_object
    cc = state0.instance_obj.shape[1] * scene.cl_valid.shape[1]
    log(f"{args.worlds} worlds, S={S} tris/world, {cc} clusters/world, "
        f"res={args.res}, accel={args.accel}")

    # On-chip correctness: scalar deferred vs dmxu at a small res.
    frames = {}
    for dmxu in ("0", "1"):
        os.environ["MRT_DEFERRED_MXU"] = dmxu

        def once(st, sc, _d=dmxu):  # fresh fn per env → fresh trace
            return raytrace(st, sc, height=128, width=128,
                            accel=args.accel)

        frames[dmxu] = jax.jit(once)(state0, scene)
    dr = np.abs(np.asarray(frames["0"].rgb, np.int16)
                - np.asarray(frames["1"].rgb, np.int16)).max()
    ds = np.array_equal(np.asarray(frames["0"].segmask),
                        np.asarray(frames["1"].segmask))
    dd = np.abs(np.asarray(frames["0"].depth)
                - np.asarray(frames["1"].depth)).max()
    cov = float((np.asarray(frames["0"].segmask) >= 0).mean())
    log(f"correctness 128px: rgb max|d|={dr} depth max|d|={dd:.3e} "
        f"segmask={'OK' if ds else 'DIFF'} coverage={cov:.2f}")
    del frames

    for dmxu in ("0", "1"):
        os.environ["MRT_DEFERRED_MXU"] = dmxu

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
        def rollout(st, sc, n, _d=dmxu):
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
        log(f"dmxu={dmxu}: compiling...")
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
        log(f"dmxu={dmxu}: {args.worlds/per:,.1f} f/s "
            f"({per*1e3:.2f} ms/step, {per*1e3/args.worlds:.3f} ms/world)")
    log("DONE")


if __name__ == "__main__":
    main()
