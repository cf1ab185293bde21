"""Where do the headline row's ~8 ms/step actually go?

The r4 ablation probe (MRT_ABLATE_*, tools/tpu_env_ab.py) read the
per-pixel pipeline stages — sweep, resolve, shade, pack, raygen — each
at <= ~4% of step time at the 4096-world 64² headline config, all
inside the round spread. So the step is NOT bound by the kernel's
per-pixel compute. The remaining candidates, probed here:

  full       the shipped path: raytrace() -> Frames (u8 rgb, depth,
             segmask) — the KNOWN ladder row (canonical 502-518k f/s)
  core       render_core() only: checksum on the packed i32 rgb —
             skips _frames_from_core (u8 unpack + rgba8 + depth/seg
             conversions), isolating the XLA epilogue share
  flat       full path, but the rollout stacks rgb reshaped to
             [W, C, H, W*4] (u8, 256-lane minor dim) instead of
             [..., W, 4] — same bytes, but the [..., 4] form tile-pads
             its minor dim 4 -> 128 (32x memory) if XLA materializes
             it that way (the r2 layout trap). flat >> full would mean
             the rollout BUFFER layout, not the render, bounds the row.
  st16/st64  MRT_SUPERTILE=16/64 on the full path — 4x/16x fewer grid
             programs, isolating the per-program floor share

Interleaved rounds, medians (±10% tunnel variance; headline-class rows
stay relatively readable in degraded sessions — CLAUDE.md note 4).

Usage: python -u tools/tpu_epilogue_probe.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--worlds", type=int, default=4096)
    ap.add_argument("--steps", type=int, nargs=2, default=[2, 6])
    args = ap.parse_args()

    from madrona_renderer_tpu.utils import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build
    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    log(f"devices: {jax.devices()}")
    state0, scene, cfg = build(args.worlds, "rt", 64, 64, "pallas")

    def dyn(s):
        half = jnp.float32(0.01)
        dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
        return dataclasses.replace(
            s, time=s.time + 0.05,
            instance_rot=quat_normalize(quat_multiply(dq, s.instance_rot)),
        )

    def make_full(tag):
        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, n, _tag=tag):
            def body(s, _):
                s = dyn(s)
                f = rp.raytrace(s, scene, height=64, width=64,
                                near=cfg.near_plane, far=cfg.far_plane)
                return s, f.rgb
            s, stack = jax.lax.scan(body, st, None, length=n)
            return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))
        return rollout

    def make_core():
        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, n):
            def body(s, _):
                s = dyn(s)
                core, _T = rp.render_core(
                    s, scene, height=64, width=64, near=cfg.near_plane,
                    far=cfg.far_plane, fov_y_degrees=90.0)
                return s, core["rgb"]
            s, stack = jax.lax.scan(body, st, None, length=n)
            return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))
        return rollout

    def make_flat():
        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, n):
            def body(s, _):
                s = dyn(s)
                f = rp.raytrace(s, scene, height=64, width=64,
                                near=cfg.near_plane, far=cfg.far_plane)
                W, C = f.rgb.shape[:2]
                return s, f.rgb.reshape(W, C, 64, 64 * 4)
            s, stack = jax.lax.scan(body, st, None, length=n)
            return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))
        return rollout

    def make_pack():
        # XLA input-pack share: the per-step world-soup gather +
        # triangle/cam row pack WITHOUT the render kernel. On static
        # scenes this work is loop-invariant in principle, but it runs
        # inside the scan exactly as the full path does — its f/s bounds
        # how much of the step the XLA front half costs (pack f/s >> full
        # f/s means the pack share is negligible; pack f/s within ~2x of
        # full means the pack is a first-order cost post-supertile).
        from madrona_renderer_tpu.ops.raytrace_ref import build_world_soup

        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, n):
            def body(s, _):
                s = dyn(s)
                soup = build_world_soup(s, scene)
                tris = rp._pack_tris(soup, scene)
                wc = jnp.ones(s.camera_pos.shape[:2], jnp.float32)
                cams = rp._pack_cams(
                    s, scene, 64, 64, 90.0 * wc, cfg.near_plane * wc,
                    1000.0 * wc, 1000.0 * wc)
                return s, (jnp.sum(tris[:, 0, ::8]) + jnp.sum(cams))
            s, stack = jax.lax.scan(body, st, None, length=n)
            return s, jnp.sum(stack)
        return rollout

    variants = []
    variants.append(("full", make_full("full")))
    variants.append(("core", make_core()))
    variants.append(("flat", make_flat()))
    variants.append(("pack", make_pack()))
    for st_budget in (16, 64):
        os.environ["MRT_SUPERTILE"] = str(st_budget)
        variants.append((f"st{st_budget}", make_full(f"st{st_budget}")))
        os.environ.pop("MRT_SUPERTILE")

    n_small, n_big = args.steps
    warm = {}
    for name, ro in variants:
        if name.startswith("st"):
            os.environ["MRT_SUPERTILE"] = name[2:]
        log(f"[{name}] compiling + warming...")
        st = jax.tree.map(jnp.copy, state0)
        for n in (n_small, n_big):
            st, ck = ro(st, n)
            float(np.asarray(ck))
        warm[name] = ro
        os.environ.pop("MRT_SUPERTILE", None)

    def time_variant(name, ro):
        if name.startswith("st"):
            os.environ["MRT_SUPERTILE"] = name[2:]
        st = jax.tree.map(jnp.copy, state0)
        st, ck = ro(st, n_small)
        float(np.asarray(ck))
        t0 = time.perf_counter()
        st, ck = ro(st, n_small)
        float(np.asarray(ck))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        st, ck = ro(st, n_big)
        float(np.asarray(ck))
        tb = time.perf_counter() - t0
        os.environ.pop("MRT_SUPERTILE", None)
        per = (tb - ts) / (n_big - n_small)
        if per <= 0:
            per = tb / n_big
        return args.worlds / per, per

    results = {n: [] for n, _ in variants}
    for rnd in range(args.rounds):
        for name, ro in variants:
            fps, per = time_variant(name, ro)
            results[name].append(fps)
            log(f"round {rnd} [{name}]: {fps:,.1f} f/s ({per*1e3:.2f} ms/step)")
    base = statistics.median(results["full"])
    for name, _ in variants:
        med = statistics.median(results[name])
        log(f"MEDIAN [{name}]: {med:,.1f} f/s  x{med/base:.3f} vs full  "
            f"over {[f'{v:,.0f}' for v in results[name]]}")
    log(f"full vs canonical 518,575: {base / 518575.0:.3f}")
    log("DONE")


if __name__ == "__main__":
    main()
