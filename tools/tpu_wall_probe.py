"""Probe the wall_render 128×128 ladder row (VERDICT r2 item 6).

Measures the wall scene at 4096 worlds with the front-to-back ordered
sweep on (MRT_ORDERED_MIN<=cc) vs off, plus the demo scene for context.
"""

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
    import numpy as np

    from bench import build
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    log(f"devices: {jax.devices()} ordered_min="
        f"{os.environ.get('MRT_ORDERED_MIN', '4')}")
    state0, scene, cfg = build(worlds, "rt", 128, 128, "pallas", scene="wall")
    cc = state0.instance_obj.shape[1] * scene.cl_valid.shape[1]
    log(f"wall scene: S={state0.instance_obj.shape[1] * scene.tris_per_object}"
        f" cc={cc}")

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def rollout(st, sc, n):
        def body(s, _):
            half = jnp.float32(0.01)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                           jnp.float32)
            from madrona_renderer_tpu.ops.quat import (
                quat_multiply, quat_normalize,
            )
            s = dataclasses.replace(
                s, time=s.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, s.instance_rot)),
            )
            f = raytrace(s, sc, height=128, width=128)
            return s, f.rgb
        s, stack = jax.lax.scan(body, st, None, length=n)
        return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

    st = jax.tree.map(jnp.copy, state0)
    n_small, n_big = 2, 8
    for n in (n_small, n_big):
        st, ck = rollout(st, scene, n)
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
    log(f"wall 128²: {worlds / per:,.0f} frames/s ({per * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
