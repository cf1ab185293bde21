"""Quick A/B of kernel variants on TPU at the north-star config."""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def measure(step, state, scene, worlds, n_small=5, n_big=20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    @partial(jax.jit, static_argnames=("n",))
    def rollout(st, sc, n):
        def body(s, _):
            s, frames = step(s, sc)
            return s, frames.rgb
        st2, stack = jax.lax.scan(body, st, None, length=n)
        return st2, stack, jnp.sum(stack[:, 0].astype(jnp.int32))

    for n in (n_small, n_big):
        state, _, ck = rollout(state, scene, n)
        float(np.asarray(ck))
    t0 = time.perf_counter()
    state, _, ck = rollout(state, scene, n_small)
    float(np.asarray(ck))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _, ck = rollout(state, scene, n_big)
    float(np.asarray(ck))
    t2 = time.perf_counter() - t0
    per_step = (t2 - t1) / (n_big - n_small)
    return per_step, worlds / per_step


def main():
    import jax
    import jax.numpy as jnp

    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from bench import build
    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    def make_step(**render_kw):
        @partial(jax.jit, donate_argnums=())
        def step(st, sc):
            half = jnp.float32(0.015)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
            st = dataclasses.replace(
                st, time=st.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, st.instance_rot)),
            )
            return st, raytrace(
                st, sc, height=64, width=64, near=0.1, far=1000.0, **render_kw
            )
        return step

    for name, kw in [
        ("brute (accel=none)", dict(accel="none")),
        ("clusters (accel=clusters)", dict(accel="clusters")),
    ]:
        state, scene, cfg = build(worlds, "rt", 64, 64, "pallas")
        per_step, fps = measure(make_step(**kw), state, scene, worlds)
        log(f"{name}: {per_step*1000:.2f} ms/step → {fps:,.0f} fps")

    log("DONE")


if __name__ == "__main__":
    main()
