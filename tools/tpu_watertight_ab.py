"""Watertight quality-tier cost A/B on the textured headline row.

Times the bench ladder's textured_4096w config (4096 worlds, 64x64 rt,
textured demo scene — reference perf contract src/headless.cpp:57-78)
with watertight=False vs watertight=True (the in-kernel Woop decision
sweep, ops/watertight.py + raytrace_pallas.py), interleaved rounds,
cross-round medians. The False variant IS the known ladder row
(canonical 401,039 f/s healthy), so a degraded session is recognizable
from the first read; headline-class kernels stay ~5-8% uniformly low in
the degraded regime, so the RELATIVE cost factor remains readable there
(docs/benchmarks.md protocol note 4).

Usage:  python -u tools/tpu_watertight_ab.py --rounds 3
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from madrona_renderer_tpu.utils import compile_cache

    compile_cache.enable()

    import jax

    import bench

    log(f"devices: {jax.devices()}")

    variants = [("textured_eps", False), ("watertight", True)]
    reads: dict[str, list[float]] = {name: [] for name, _ in variants}
    for r in range(args.rounds):
        for name, wt in variants:
            fps = bench.run_config(
                args.worlds, args.steps, "rt", 64, 64, "pallas",
                scene="textured", watertight=wt,
            )
            reads[name].append(fps)
            log(f"round {r} [{name}]: {fps:,.0f} f/s")
    base = statistics.median(reads["textured_eps"])
    for name, _ in variants:
        med = statistics.median(reads[name])
        log(
            f"MEDIAN [{name}]: {med:,.0f} f/s  x{med / base:.3f} vs eps  "
            f"(reads: {['%.0f' % v for v in reads[name]]})"
        )
    log(f"vs canonical textured_4096w 401,039: {base / 401039.0:.3f} "
        "(>>10% low => degraded session; relative factor still readable)")


if __name__ == "__main__":
    main()
