"""One-process TPU benchmark session.

Runs correctness + escalating perf configs in a single client process (the
axon tunnel is single-client and fragile across client churn; see
tools/tpu_ladder.py). Prints flush-immediate progress so a watcher can see
exactly where a hang happens. DO NOT kill this mid-run unless necessary —
killing a client during device execution wedges the tunnel for a long time.

Usage: python -u tools/tpu_bench_session.py [--max-worlds 4096]
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
    ap.add_argument("--max-worlds", type=int, default=4096)
    ap.add_argument("--impl", default="pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")

    from bench import build
    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize

    if args.impl == "pallas":
        from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as render
        from madrona_renderer_tpu.ops.raster_pallas import rasterize as raster
    else:
        from madrona_renderer_tpu.ops.raytrace_ref import raytrace as render
        from madrona_renderer_tpu.ops.raster_ref import rasterize as raster

    # ---- Stage 1: correctness at 4 worlds vs CPU reference --------------
    log("stage 1: correctness 4 worlds 64x64")
    state, scene, cfg = build(4, "rt", 64, 64, args.impl)
    frames = render(state, scene, height=64, width=64, near=0.1, far=1000.0)
    tpu_rgb = np.asarray(frames.rgb)
    tpu_seg = np.asarray(frames.segmask)
    log(f"  tpu: rgb sum={int(tpu_rgb.astype(np.int64).sum())} "
        f"seg vals={np.unique(tpu_seg).tolist()}")

    # CPU reference in-process (separate cpu backend call).
    cpu = jax.devices("cpu")[0]
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace as render_cpu

    state_c = jax.device_put(state, cpu)
    scene_c = jax.device_put(scene, cpu)
    with jax.default_device(cpu):
        frames_c = render_cpu(state_c, scene_c, height=64, width=64)
    cpu_rgb = np.asarray(frames_c.rgb)
    diff = np.abs(tpu_rgb.astype(np.int16) - cpu_rgb.astype(np.int16))
    log(f"  vs cpu: max rgb LSB diff = {diff.max()}, mismatched px = "
        f"{int((diff.max(axis=-1) > 1).sum())}")

    # ---- Stage 2+: perf ladder ------------------------------------------
    def bench_one(num_worlds, mode, width, height, steps):
        state, scene, cfg = build(num_worlds, mode, width, height, args.impl)
        fn = render if mode == "rt" else raster
        near = 0.1 if mode == "rt" else 0.001

        @partial(jax.jit, donate_argnums=(0,))
        def step(st, sc):
            half = jnp.float32(0.015)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
            st = dataclasses.replace(
                st, time=st.time + 0.05, instance_rot=quat_normalize(quat_multiply(dq, st.instance_rot))
            )
            return st, fn(st, sc, height=height, width=width, near=near, far=1000.0)

        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, sc, n):
            def body(s, _):
                s, frames = step(s, sc)
                return s, frames.rgb
            return jax.lax.scan(body, st, None, length=n)

        # Two-point measurement: time n_small and n_big rollouts (both
        # pre-compiled), sync via a value fetch of a checksum that depends
        # on every frame (block_until_ready is unreliable over this
        # platform's tunnel; only fetches truly sync). The slope removes
        # constant dispatch/fetch/tunnel overhead.
        n_small, n_big = max(2, steps // 4), steps

        @partial(jax.jit, static_argnames=("n",))
        def rollout_ck(st, sc, n):
            st2, stack = rollout(st, sc, n)
            return st2, stack, jnp.sum(stack[:, 0].astype(jnp.int32))

        t0 = time.perf_counter()
        state, _, ck = rollout_ck(state, scene, n_small)
        float(np.asarray(ck))
        state, _, ck = rollout_ck(state, scene, n_big)
        float(np.asarray(ck))
        log(f"  compile+warmup {time.perf_counter() - t0:.1f}s")

        t0 = time.perf_counter()
        state, _, ck = rollout_ck(state, scene, n_small)
        float(np.asarray(ck))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, _, ck = rollout_ck(state, scene, n_big)
        float(np.asarray(ck))
        t_big = time.perf_counter() - t0
        per_step = (t_big - t_small) / (n_big - n_small)
        fps = num_worlds / per_step
        log(f"  {num_worlds}w {mode} {width}x{height}: {per_step*1000:.2f} ms/step "
            f"(t{n_small}={t_small*1000:.0f}ms t{n_big}={t_big*1000:.0f}ms) "
            f"→ {fps:,.0f} frames/s (vs 1e5 north-star: {fps/1e5:.1f}x)")
        return fps

    stages = [
        (16, "rt", 64, 64, 20),
        (256, "rt", 64, 64, 20),
        (1024, "rt", 64, 64, 20),
    ]
    if args.max_worlds >= 4096:
        stages += [(4096, "rt", 64, 64, 20), (256, "rast", 64, 64, 20),
                   (4096, "rt", 128, 128, 5), (8192, "rt", 64, 64, 10)]
    for num_worlds, mode, w, h, steps in stages:
        if num_worlds > args.max_worlds and not (w > 64):
            continue
        log(f"stage: {num_worlds} worlds {mode} {w}x{h}")
        bench_one(num_worlds, mode, w, h, steps)

    log("SESSION COMPLETE")


if __name__ == "__main__":
    main()
