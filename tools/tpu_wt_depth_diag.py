"""Quantify the on-chip watertight depth divergence (kernel vs jnp).

r4 chainE parity run: the watertight demo configs read rgb/segmask
EXACT but ~5% of depth pixels differ (tools/tpu_parity_check.py).
Winner identical + rgb identical (the shading epilogue recomputes the
winner via _moller_trumbore on both impls) means only the stored Woop
``t = (u*az + v*bz + w*cz) / det`` rounds differently — prime suspect:
Mosaic's f32 divide rounds differently from XLA:TPU's (the known
dequant-LUT gotcha, docs/design.md).

This probe measures the magnitude: ULP distance histogram of kernel vs
jnp depth on the demo + terrain watertight configs, plus the relative
error. If it is ulp-level, the right fix is a documented ulp-tolerant
parity criterion for watertight depth (the no-crack property lives in
the DECISIONS, which are bitwise — proven by segmask/rgb exactness),
not kernel heroics to replicate another backend's divide rounding.

Usage: python -u tools/tpu_wt_depth_diag.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def ulp_diff(a, b):
    """IEEE-754 ULP distance between two f32 arrays (same sign branch
    via offset encoding: negative floats map below positives)."""
    import numpy as np

    ia = a.astype(np.float32).view(np.int32).astype(np.int64)
    ib = b.astype(np.float32).view(np.int32).astype(np.int64)
    # offset encoding: i >= 0 -> i ; i < 0 -> INT32_MIN - i  (monotone)
    ka = np.where(ia >= 0, ia, np.int64(-(2**31)) - ia)
    kb = np.where(ib >= 0, ib, np.int64(-(2**31)) - ib)
    return np.abs(ka - kb)


def report(name, got, want):
    import numpy as np

    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    d = ulp_diff(g, w)
    n = int((d > 0).sum())
    tot = d.size
    log(f"{name}: {n}/{tot} px differ ({100.0 * n / tot:.3f}%)")
    if n:
        vals, counts = np.unique(d[d > 0], return_counts=True)
        hist = ", ".join(f"{int(v)}ulp x{int(c)}" for v, c in zip(vals[:8], counts[:8]))
        log(f"  ulp histogram: {hist}{' ...' if vals.size > 8 else ''}")
        log(f"  max ulp: {int(d.max())}")
        mask = d > 0
        rel = np.abs(g[mask] - w[mask]) / np.maximum(np.abs(w[mask]), 1e-20)
        log(f"  max rel err: {rel.max():.3e}")


def main():
    import jax
    import numpy as np

    from madrona_renderer_tpu.ops import raytrace_pallas, raytrace_ref

    log(f"devices: {jax.devices()}")

    from bench import build

    for res in (64, 128):
        state, scene, cfg = build(8, "rt", res, res, "pallas")
        got = raytrace_pallas.raytrace(
            state, scene, height=res, width=res, near=cfg.near_plane,
            far=cfg.far_plane, watertight=True)
        want = raytrace_ref.raytrace(
            state, scene, height=res, width=res, near=cfg.near_plane,
            far=cfg.far_plane, watertight=True)
        seg_eq = (np.asarray(got.segmask) == np.asarray(want.segmask)).all()
        log(f"demo res={res} watertight: segmask exact={bool(seg_eq)}")
        report(f"demo res={res} depth", got.depth, want.depth)

    from tools.tpu_bigmesh_bench import build_scene as terrain

    t_state, t_scene = terrain(2)
    got = raytrace_pallas.raytrace(
        t_state, t_scene, height=128, width=128, watertight=True)
    want = raytrace_ref.raytrace(
        t_state, t_scene, height=128, width=128, watertight=True)
    report("terrain 128² depth", got.depth, want.depth)
    log("DONE")


if __name__ == "__main__":
    main()
