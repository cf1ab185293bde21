"""Profile the big-mesh terrain step on TPU: top ops by device self-time.

Separates the Pallas render kernel's time from the XLA support passes
(TLAS refit, screen-space binning/argsort, epilogue) so large-mesh
optimization targets the right component.
Usage: python -u tools/tpu_terrain_profile.py [--worlds 32] [--res 512]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=32)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--accel", default="binned")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.tpu_binned_bench import build_scene
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    state, scene = build_scene(args.worlds, 224)

    @jax.jit
    def step(st, sc):
        f = raytrace(st, sc, height=args.res, width=args.res,
                     accel=args.accel)
        return f.rgb

    rgb = step(state, scene)
    np.asarray(rgb[0, 0, 0, 0])  # warm + sync
    log("compiled; tracing profile")

    trace_dir = "/tmp/mrt_terrain_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            rgb = step(state, scene)
        np.asarray(rgb[0, 0, 0, 0])

    # Parse the trace: sum self-time per op name from the .trace.json.gz.
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    log(f"trace files: {paths}")
    tot = defaultdict(float)
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pidname = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # ms
            if dur <= 0:
                continue
            tot[name] += dur
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    for name, ms in top:
        log(f"{ms:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
