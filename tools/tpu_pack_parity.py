"""On-chip pack-kernel parity: compiled pack_rows_pallas (Mosaic) vs
the XLA planar pack, row-level and frame-level.

CPU interpret-mode parity is covered by tests/test_pack_kernel.py
(strict bitwise). This covers the actual hardware lowering. Criterion:

  * every packed row except ``density`` must be BITWISE equal — the
    kernel mirrors the XLA expression trees term-for-term and the only
    divides (inverse scale) are computed XLA-side on both paths;
  * the mip ``density`` row (attr row 19) may differ by ulps on
    textured scenes (Mosaic f32 divide/sqrt round differently than
    XLA:TPU — CLAUDE.md); tolerance 1e-5 relative. For untextured
    scenes it is exactly 0 on both sides;
  * frames with MRT_PACK_KERNEL=1 vs 0 must be bitwise when the rows
    are bitwise; any pixel diffs are reported with the edge-aware
    breakdown (tpu_parity_check.py's criterion) for diagnosis.

Run BEFORE recording any MRT_PACK_KERNEL bench numbers.
Usage: python -u tools/tpu_pack_parity.py [--worlds 8]

Reference anchor: the instance-buffer gather both packs re-create
(``RenderingSystem::setupTasks``, reference ``src/sim.cpp:122-126``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


_DENSITY_ATTR_ROW = 19  # density = attr row 19 (split) / row 29 (plain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=8)
    args = ap.parse_args()

    from madrona_renderer_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu smoke really runs on CPU

    import jax
    import numpy as np

    from madrona_renderer_tpu.utils import compile_cache

    compile_cache.enable()
    log(f"devices: {jax.devices()}")

    from bench import build
    from madrona_renderer_tpu.ops.pack_pallas import pack_rows_pallas as _prp
    from madrona_renderer_tpu.ops.raytrace_pallas import (
        _pack_rows_planar, raytrace,
    )

    # CPU smoke (JAX_PLATFORMS=cpu): Mosaic can't compile on the CPU
    # backend — route through interpret mode there (the real bitwise
    # CPU coverage lives in tests/test_pack_kernel.py).
    interp = jax.default_backend() not in ("tpu", "axon")
    if interp:
        log("CPU backend: pack kernel runs in interpret mode (smoke)")

    def pack_rows_pallas(*a, **kw):
        return _prp(*a, interpret=interp, **kw)

    failures = 0

    def cmp_rows(name, ref, kern, density_rows=()):
        nonlocal failures
        ref = np.asarray(ref)
        kern = np.asarray(kern)[:, :, : ref.shape[2]]
        for r in range(ref.shape[1]):
            a, b = ref[:, r], kern[:, r]
            if r in density_rows:
                ok = np.allclose(b, a, rtol=1e-5, atol=1e-30)
                tag = "tol"
            else:
                ok = (a.view(np.int32) == b.view(np.int32)).all()
                tag = "bitwise"
            if not ok:
                bad = int((a != b).sum())
                mx = float(np.abs(a - b).max())
                log(f"  {name} row {r}: {bad} mismatches, max |d|={mx:.3e}"
                    f" ({tag}) -> FAIL")
                failures += 1
        log(f"  {name}: rows checked ({ref.shape[1]})")

    for scene_name in ("demo", "textured"):
        state, scene, cfg = build(
            args.worlds, "rt", 64, 64, "pallas", scene=scene_name
        )
        cam_pos = state.camera_pos[:, 0, :]
        log(f"scene {scene_name}: S="
            f"{state.instance_obj.shape[1] * scene.tris_per_object}")

        # Row-level: split+prep (the headline layout) and plain.
        a_geo_attr = jax.jit(
            lambda st, sc: _pack_rows_planar(st, sc, cam_pos=cam_pos,
                                             split=True)
        )(state, scene)
        geo, attrs = jax.jit(
            lambda st, sc: pack_rows_pallas(st, sc, cam_pos=cam_pos,
                                            split=True)
        )(state, scene)
        cmp_rows(f"{scene_name}/split_prep/geo", a_geo_attr[:, :16], geo)
        cmp_rows(
            f"{scene_name}/split_prep/attr", a_geo_attr[:, 16:], attrs,
            density_rows=(_DENSITY_ATTR_ROW,),
        )
        a_plain = jax.jit(_pack_rows_planar)(state, scene)
        b_plain = jax.jit(
            lambda st, sc: pack_rows_pallas(st, sc)
        )(state, scene)
        cmp_rows(f"{scene_name}/plain", a_plain, b_plain,
                 density_rows=(29,))

        # Frame-level: knob on vs off (env knobs bind at trace time —
        # clear the jit cache between flips, CLAUDE.md).
        frames = {}
        for knob in ("1", "0"):
            os.environ["MRT_PACK_KERNEL"] = knob
            jax.clear_caches()
            f = raytrace(state, scene, height=64, width=64,
                         near=cfg.near_plane, far=cfg.far_plane)
            frames[knob] = jax.tree_util.tree_map(np.asarray, f)
        os.environ.pop("MRT_PACK_KERNEL", None)
        for field in ("rgb", "depth", "segmask"):
            a = getattr(frames["0"], field)
            b = getattr(frames["1"], field)
            if (np.asarray(a) == np.asarray(b)).all():
                log(f"  {scene_name}/frames/{field}: bitwise")
            else:
                bad = int((np.asarray(a) != np.asarray(b)).sum())
                log(f"  {scene_name}/frames/{field}: {bad} mismatched "
                    "elements -> FAIL")
                failures += 1

    log(f"pack parity: {'PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
