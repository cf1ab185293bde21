"""Measure dispatch-loop vs lax.scan rollout costs for the step program."""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = 20
    log(f"worlds={worlds}")

    from bench import build
    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as render

    def fresh():
        state, scene, cfg = build(worlds, "rt", 64, 64, "pallas")
        return state, scene

    @jax.jit
    def step(st, sc):
        half = jnp.float32(0.015)
        dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
        st = dataclasses.replace(
            st, time=st.time + 0.05, instance_rot=quat_normalize(quat_multiply(dq, st.instance_rot))
        )
        return st, render(st, sc, height=64, width=64, near=0.1, far=1000.0)

    # Variant 1: python loop, async dispatch, block at end.
    state, scene = fresh()
    st, frames = step(state, scene)
    jax.block_until_ready(frames.rgb)
    t0 = time.perf_counter()
    for _ in range(steps):
        st, frames = step(st, scene)
    jax.block_until_ready(frames.rgb)
    dt1 = time.perf_counter() - t0
    log(f"loop(async):        {dt1*1000/steps:7.2f} ms/step → {steps*worlds/dt1:,.0f} fps")

    # Variant 2: lax.scan stacking rgb ys.
    @partial(jax.jit, static_argnames=("n",))
    def rollout_ys(st, sc, n):
        def body(s, _):
            s, frames = step(s, sc)
            return s, frames.rgb
        return jax.lax.scan(body, st, None, length=n)

    state, scene = fresh()
    st, stack = rollout_ys(state, scene, steps)
    jax.block_until_ready(stack)
    t0 = time.perf_counter()
    st, stack = rollout_ys(st, scene, steps)
    jax.block_until_ready(stack)
    dt2 = time.perf_counter() - t0
    log(f"scan(stack rgb):    {dt2*1000/steps:7.2f} ms/step → {steps*worlds/dt2:,.0f} fps")

    # Variant 3: lax.scan with tiny checksum carry (no ys).
    @partial(jax.jit, static_argnames=("n",))
    def rollout_sum(st, sc, n):
        def body(carry, _):
            s, acc = carry
            s, frames = step(s, sc)
            acc = acc + frames.rgb[0, 0, 0, 0, 0].astype(jnp.int32)
            return (s, acc), None
        (s, acc), _ = jax.lax.scan(body, (st, jnp.int32(0)), None, length=n)
        return s, acc

    state, scene = fresh()
    st, acc = rollout_sum(state, scene, steps)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    st, acc = rollout_sum(st, scene, steps)
    jax.block_until_ready(acc)
    dt3 = time.perf_counter() - t0
    log(f"scan(checksum):     {dt3*1000/steps:7.2f} ms/step → {steps*worlds/dt3:,.0f} fps")

    log("DONE")


if __name__ == "__main__":
    main()
