"""TPU validation ladder: escalating smoke tests, each in its own
subprocess with a timeout, stopping at the first hang/failure.

The axon tunnel serializes one client and a wedged device program can stall
the chip for a long time, so TPU debugging must be incremental: run
``python tools/tpu_ladder.py`` and it reports the highest rung that passes.
Each rung is also runnable directly: ``python tools/tpu_ladder.py RUNG``.
"""

from __future__ import annotations

import subprocess
import sys
import time

RUNGS = [
    "basic_op",
    "pallas_copy",
    "pallas_grid_smem",
    "pallas_fori_smem",
    "intersect_tiny",
    "raytrace_16w",
    "bench_256w",
]


def basic_op():
    import jax.numpy as jnp

    assert int(jnp.arange(8).sum()) == 28


def pallas_copy():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert float(y.sum()) == 2048.0


def pallas_grid_smem():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, x_ref, o_ref):
        o_ref[0] = x_ref[0] + s_ref[0, 0, 0]

    x = jnp.ones((4, 8, 128), jnp.float32)
    s = jnp.asarray(np.arange(4, dtype=np.float32)).reshape(4, 1, 1)
    y = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
    )(s, x)
    assert float(y[3, 0, 0]) == 4.0


def pallas_fori_smem():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 32

    def kernel(tri_ref, o_ref):
        def body(i, acc):
            return acc + tri_ref[0, 0, i]

        total = jax.lax.fori_loop(0, S, body, jnp.float32(0.0))
        o_ref[0] = jnp.full((8, 128), total, jnp.float32)

    tris = jnp.asarray(np.arange(2 * 3 * S, dtype=np.float32)).reshape(2, 3, S)
    y = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.float32),
    )(tris)
    assert float(y[0, 0, 0]) == float(np.arange(S).sum())


def intersect_tiny():
    import numpy as np

    from madrona_renderer_tpu.config import ImportedCamera, ImportedInstance, WorldInit
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    sys.path.insert(0, ".")
    from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz

    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
    )
    f = raytrace(state, scene, height=64, width=64)
    seg = np.asarray(f.segmask)
    assert (seg == 0).all(), seg

def raytrace_16w():
    import os

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build as bench_build
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    state, scene, cfg = bench_build(16, "rt", 64, 64, "pallas")
    f = raytrace(state, scene, height=64, width=64)
    assert (np.asarray(f.segmask) >= -1).all()
    assert (np.asarray(f.depth) > 0).any()


def bench_256w():
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import run_config

    fps = run_config(256, 10, "rt", 64, 64, "pallas", warmup=2)
    print(f"  256w pallas fps: {fps:.0f}")


def main():
    if len(sys.argv) > 1:
        globals()[sys.argv[1]]()
        print(f"PASS {sys.argv[1]}")
        return
    # The axon tunnel is single-client and takes a few seconds to release
    # its slot after a client exits; connecting too soon hangs forever. So:
    # pause between rungs, and retry a hung rung once before concluding.
    for rung in RUNGS:
        time.sleep(20)
        for attempt in (1, 2):
            t0 = time.time()
            try:
                res = subprocess.run(
                    [sys.executable, "-u", __file__, rung],
                    timeout=240,
                    capture_output=True,
                    text=True,
                )
            except subprocess.TimeoutExpired:
                if attempt == 1:
                    print(f"timeout at rung '{rung}' — waiting 90s and retrying once")
                    time.sleep(90)
                    continue
                print(f"HANG at rung '{rung}' (2x240s) — stop; device likely wedged")
                return
            break
        dt = time.time() - t0
        if res.returncode != 0:
            print(f"FAIL at rung '{rung}' ({dt:.1f}s):")
            print(res.stdout[-2000:])
            print(res.stderr[-2000:])
            return
        print(f"ok {rung} ({dt:.1f}s){res.stdout.strip()[4 + len(rung):] or ''}", flush=True)
    print("ALL RUNGS PASS")


if __name__ == "__main__":
    main()
