"""On-chip pixel parity: compiled Pallas kernel (real TPU mosaic) vs the
jnp reference renderer, on the demo scene at several resolutions.

CPU interpret-mode parity is covered by tests/test_pallas_parity.py (strict
±1 LSB); this covers the actual hardware lowering (tile shapes, SMEM reads,
prepass scratch persistence). Run after any kernel change, before recording
bench numbers.

On hardware the criterion is edge-aware: two different TPU programs (XLA
vs Mosaic codegen) round f32 differently (e.g. divides via refined
reciprocals), so a knife-edge silhouette pixel can flip between the two
surfaces competing at a depth discontinuity. Verified root cause (demo
scene, pixel w0(31,27)): ref and kernel ray directions are BITWISE equal,
f64 ground truth puts the hit at u+v = 0.99944 (inside by 5e-4), the
kernel agrees with f64 and the jnp-on-TPU path does not. Criterion here:
  - every mismatching pixel must be an edge race — the value each side
    produced appears in the other side's 3×3 neighborhood, and
  - mismatches total < 0.1% of pixels.

Usage: python -u tools/tpu_parity_check.py [--worlds 8] [--res 64 128 96]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=8)
    ap.add_argument("--res", type=int, nargs="*", default=[64, 128, 96])
    ap.add_argument("--modes", nargs="*", default=["rt", "rast"])
    args = ap.parse_args()

    import jax
    import numpy as np

    log(f"devices: {jax.devices()}")

    def neighborhood_match(a, b):
        """True per pixel where some 3×3-neighbor of b equals a exactly
        (leading dims batch; trailing 2 or 3 dims are H, W[, channels])."""
        if a.ndim == b.ndim == 4:  # W, C, H, Wd
            a = a[..., None]
            b = b[..., None]
        out = np.zeros(a.shape[:-1], bool)
        H = a.shape[-3]
        Wd = a.shape[-2]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sb = np.roll(np.roll(b, dy, axis=-3), dx, axis=-2)
                eq = (a == sb).all(axis=-1)
                # roll wraps; mask the wrapped border
                ys = np.arange(H)
                xs = np.arange(Wd)
                oky = (ys - dy >= 0) & (ys - dy < H)
                okx = (xs - dx >= 0) & (xs - dx < Wd)
                eq &= oky[:, None] & okx[None, :]
                out |= eq
        return out

    def edge_aware_ok(got, want, name, res):
        g = np.asarray(got)
        w = np.asarray(want)
        if g.ndim == 5:  # rgb [W,C,H,Wd,4]
            exact = (g == w).all(axis=-1)
        elif np.issubdtype(g.dtype, np.floating):
            # ulp-scale relative tolerance: far hits (t ~ 1e3) legitimately
            # differ by ~1e-3 absolute between the two codegens.
            exact = np.abs(g - w) <= np.maximum(1e-3, 1e-5 * np.abs(w))
        else:
            exact = g == w
        bad = ~exact
        n_bad = int(bad.sum())
        frac = n_bad / exact.size
        if n_bad == 0:
            log(f"  {name}: exact")
            return True
        # Edge race: got's value must exist in want's 3x3 neighborhood
        # and vice versa.
        if g.ndim == 4:
            race = neighborhood_match(g, w) & neighborhood_match(w, g)
        else:
            race = neighborhood_match(g, w) & neighborhood_match(w, g)
        non_edge = int((bad & ~race).sum())
        ok = frac < 1e-3 and non_edge == 0
        log(
            f"  {name}: {n_bad} mismatched px ({100*frac:.4f}%), "
            f"{non_edge} not explainable as edge races -> "
            f"{'OK' if ok else 'FAIL'}"
        )
        return ok

    from bench import build
    from madrona_renderer_tpu.ops import raster_pallas, raster_ref
    from madrona_renderer_tpu.ops import raytrace_pallas, raytrace_ref

    def build_tex(worlds, mode_str, res):
        from madrona_renderer_tpu.config import RenderMode
        from madrona_renderer_tpu.assets.importer import load_render_assets
        from madrona_renderer_tpu.core.scene import bake_scene
        from madrona_renderer_tpu.core.state import init_state
        from madrona_renderer_tpu.runners.scenes import demo_config

        mode = (RenderMode.Raytracer if mode_str == "rt"
                else RenderMode.Rasterizer)
        cfg = demo_config(worlds, mode, res, res, dynamic=True, textured=True)
        assets = load_render_assets(
            cfg.rcfg.geo_cfg, cfg.rcfg.asset_paths, cfg.rcfg.additional_mats,
            cfg.rcfg.additional_textures)
        scene = bake_scene(assets)
        state = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)
        return state, scene, cfg

    failures = 0
    for textured in (False, True):
        for res in args.res:
            for mode in args.modes:
                if textured:
                    state, scene, cfg = build_tex(args.worlds, mode, res)
                else:
                    state, scene, cfg = build(args.worlds, mode, res, res,
                                              "pallas")
                if mode == "rt":
                    near = cfg.near_plane
                    got = raytrace_pallas.raytrace(
                        state, scene, height=res, width=res, near=near,
                        far=cfg.far_plane)
                    want = raytrace_ref.raytrace(
                        state, scene, height=res, width=res, near=near,
                        far=cfg.far_plane)
                else:
                    near = cfg.raster_near_plane
                    got = raster_pallas.rasterize(
                        state, scene, height=res, width=res, near=near,
                        far=cfg.far_plane)
                    want = raster_ref.rasterize(
                        state, scene, height=res, width=res, near=near,
                        far=cfg.far_plane)
                log(f"res={res} mode={mode} textured={textured}:")
                ok = edge_aware_ok(got.rgb, want.rgb, "rgb", res)
                ok &= edge_aware_ok(got.depth, want.depth, "depth", res)
                ok &= edge_aware_ok(got.segmask, want.segmask, "segmask", res)
                failures += not ok
    # --- Big-mesh configs: DMA-streamed clusters, binned 2D tiles,
    # deferred split layout (r3) — both render modes, on hardware. ---
    from tools.tpu_binned_bench import build_scene as build_terrain

    t_state, t_scene = build_terrain(2, 72)  # 10,368 tris → DMA path
    for mode in args.modes:
        for accel in ("binned", "clusters"):
            if mode == "rt":
                got = raytrace_pallas.raytrace(
                    t_state, t_scene, height=256, width=256, accel=accel)
                want = raytrace_ref.raytrace(
                    t_state, t_scene, height=256, width=256)
            else:
                got = raster_pallas.rasterize(
                    t_state, t_scene, height=256, width=256, accel=accel)
                want = raster_ref.rasterize(
                    t_state, t_scene, height=256, width=256)
            log(f"terrain 256² mode={mode} accel={accel} (deferred DMA):")
            ok = edge_aware_ok(got.rgb, want.rgb, "rgb", 256)
            ok &= edge_aware_ok(got.depth, want.depth, "depth", 256)
            ok &= edge_aware_ok(got.segmask, want.segmask, "segmask", 256)
            failures += not ok

    # --- Watertight decision sweep (r4): the Woop in-kernel decision vs
    # the jnp watertight wrapper, demo scene + the terrain DMA config.
    # rgb/segmask hold the bitwise bar (edge-aware for knife-edge seam
    # flips: the two codegens may fuse a*b - c*d differently — the FMA
    # caveat in ops/watertight.py). DEPTH holds a documented looser bar:
    # the jnp wrapper computes the Woop t through einsum-selected shear
    # coordinates (XLA codegen, FMA-contractable) while the kernel uses
    # per-pixel component selects (Mosaic, no contraction), so the
    # stored t of the SAME winner rounds differently on ~40% of hit
    # pixels — 1-8 ulp body, catastrophic-cancellation tail ≤ ~6e-4
    # relative at silhouette-adjacent hits (measured on chip AND on
    # CPU with near-identical histograms: tools/tpu_wt_depth_diag.py,
    # docs/benchmarks.md r4 campaign). rel 1e-3 is the bar; winner
    # identity and the no-crack DECISION stay bitwise via segmask/rgb.
    def wt_depth_ok(got_d, want_d):
        g = np.asarray(got_d, np.float32)
        w = np.asarray(want_d, np.float32)
        rel = np.abs(g - w) / np.maximum(np.abs(w), 1e-20)
        bad = float((rel > 1e-3).mean())
        log(f"  depth (watertight bar): {(g != w).mean():.4f} differ, "
            f"max rel {rel.max():.2e} -> {'ok' if bad == 0 else 'FAIL'}")
        return bad == 0

    for res in args.res[:2]:
        state, scene, cfg = build(args.worlds, "rt", res, res, "pallas")
        got = raytrace_pallas.raytrace(
            state, scene, height=res, width=res, near=cfg.near_plane,
            far=cfg.far_plane, watertight=True)
        want = raytrace_ref.raytrace(
            state, scene, height=res, width=res, near=cfg.near_plane,
            far=cfg.far_plane, watertight=True)
        log(f"watertight res={res} rt:")
        ok = edge_aware_ok(got.rgb, want.rgb, "rgb", res)
        ok &= wt_depth_ok(got.depth, want.depth)
        ok &= edge_aware_ok(got.segmask, want.segmask, "segmask", res)
        failures += not ok
    got = raytrace_pallas.raytrace(
        t_state, t_scene, height=128, width=128, watertight=True)
    want = raytrace_ref.raytrace(
        t_state, t_scene, height=128, width=128, watertight=True)
    log("watertight terrain 128² rt (raw-row DMA):")
    ok = edge_aware_ok(got.rgb, want.rgb, "rgb", 128)
    ok &= wt_depth_ok(got.depth, want.depth)
    ok &= edge_aware_ok(got.segmask, want.segmask, "segmask", 128)
    failures += not ok

    # --- Supertile budgets on hardware (r4): the world/tile fold only
    # re-tiles the grid, so budgets 1/4/64 must be BITWISE equal to each
    # other on the real Mosaic lowering (interpret-mode parity is
    # tests/test_pallas_parity.py::test_parity_supertile_budgets; this
    # checks the hardware codegen of the folded .at sub-views). 64
    # worlds so the wpp=64 world-fold actually engages. Required
    # evidence before any MRT_SUPERTILE default change.
    st_state, st_scene, st_cfg = build(64, "rt", 64, 64, "pallas")
    st_outs = {}
    for budget in ("1", "4", "64"):
        os.environ["MRT_SUPERTILE"] = budget
        st_outs[budget] = raytrace_pallas.raytrace(
            st_state, st_scene, height=64, width=64,
            near=st_cfg.near_plane, far=st_cfg.far_plane)
    os.environ.pop("MRT_SUPERTILE", None)
    base = st_outs["1"]
    for budget in ("4", "64"):
        o = st_outs[budget]
        same = all(
            (np.asarray(getattr(base, f)) == np.asarray(getattr(o, f))).all()
            for f in ("rgb", "depth", "segmask")
        )
        log(f"supertile budget {budget} vs 1 (64w 64² rt): "
            f"{'bitwise equal' if same else 'MISMATCH'}")
        failures += not same

    # --- Paged mip textures (r3): looser criterion — the mip level /
    # nearest-texel choice at exact boundaries is ambiguous between the
    # two codegens (see tests/test_mips.py docstring). ---
    from tools.tpu_paged_tex_bench import build_scene as build_paged

    p_state, p_scene = build_paged(4, 256, "auto")
    got = raytrace_pallas.raytrace(p_state, p_scene, height=64, width=64)
    want = raytrace_ref.raytrace(p_state, p_scene, height=64, width=64)
    d = np.abs(np.asarray(got.rgb, np.int16) - np.asarray(want.rgb, np.int16))
    frac = float((d.max(axis=-1) > 2).mean())
    ok = d.max() <= 64 and frac <= 0.02
    log(f"paged 256²-texture 64²: max|d|={d.max()} frac>2={frac:.4f} -> "
        f"{'OK' if ok else 'FAIL'}")
    failures += not ok

    if failures:
        log(f"{failures} FAILURES")
        return 1
    log("all parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
