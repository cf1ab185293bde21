"""Profile the step on TPU and print the top ops by device self-time."""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    impl = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    log(f"devices {jax.devices()}, worlds={worlds} impl={impl}")

    from bench import build
    from madrona_renderer_tpu.ops.quat import quat_multiply

    if impl == "pallas":
        from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as render
    else:
        from madrona_renderer_tpu.ops.raytrace_ref import raytrace as render

    state, scene, cfg = build(worlds, "rt", 64, 64, impl)

    @partial(jax.jit, donate_argnums=(0,))
    def step(st, sc):
        half = jnp.float32(0.015)
        dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
        st = dataclasses.replace(
            st, time=st.time + 0.05, instance_rot=quat_multiply(dq, st.instance_rot)
        )
        return st, render(st, sc, height=64, width=64, near=0.1, far=1000.0)

    # warm
    for _ in range(2):
        state, frames = step(state, scene)
    jax.block_until_ready(frames.rgb)
    log("warm done; tracing 5 steps")

    logdir = "/tmp/mrt_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        state, frames = step(state, scene)
    jax.block_until_ready(frames.rgb)
    jax.profiler.stop_trace()
    log("trace captured; parsing")

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        log(f"no trace files under {logdir}: {os.listdir(logdir)}")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Sum durations per op name on device tracks.
    by_name = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            by_name[name] += e["dur"]
            count[name] += 1
    total = sum(by_name.values())
    log(f"total traced op-time {total/1e3:.1f} ms across {len(by_name)} op names")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3:9.2f} ms  x{count[name]:<5} {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
