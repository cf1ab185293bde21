"""Is jax.block_until_ready honest on the axon platform?

Dispatch a known-heavy program, then time: (a) block_until_ready,
(b) fetching one element to host. If (a) ≪ (b), block lies and every
benchmark must sync via a value fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as render

    state, scene, cfg = build(4096, "rt", 64, 64, "pallas")

    @jax.jit
    def heavy(st, sc, n):
        def body(i, acc):
            frames = render(
                st, sc, height=64, width=64, near=0.1, far=1000.0
            )
            return acc + frames.depth.sum() * (i + 1)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # warm
    x = heavy(state, scene, 1)
    _ = np.asarray(x)
    log("warmed")

    for n in (1, 5, 20):
        t0 = time.perf_counter()
        x = heavy(state, scene, n)
        t_dispatch = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(x)
        t_block = time.perf_counter() - t0
        t0 = time.perf_counter()
        val = float(np.asarray(x))
        t_fetch = time.perf_counter() - t0
        log(
            f"n={n:3d}: dispatch {t_dispatch*1000:8.2f} ms | block "
            f"{t_block*1000:8.2f} ms | fetch {t_fetch*1000:8.2f} ms | val {val:.3e}"
        )
    log("DONE")


if __name__ == "__main__":
    main()
