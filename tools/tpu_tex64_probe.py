"""Resident 64×64-texture probe: tex_rows = 32 → the dynamic-bound
fetch gate boundary. A/B MRT_DYN_FETCH on the in-kernel resident
sampling path (the 32×32 ladder row has tex_rows = 8 where the static
sweep wins; this measures the next pool size up).

Usage: python tools/tpu_tex64_probe.py [worlds]
Env:   MRT_DYN_FETCH=0|1 (set per run; the kernel reads it at trace).
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

    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.config import RenderMode
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace
    from madrona_renderer_tpu.runners.scenes import demo_config

    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    log(f"devices: {jax.devices()} MRT_DYN_FETCH="
        f"{os.environ.get('MRT_DYN_FETCH', '1')}")
    cfg = demo_config(worlds, RenderMode.Raytracer, 64, 64, dynamic=True,
                      impl="pallas", textured=True, tex_size=64)
    assets = load_render_assets(
        cfg.rcfg.geo_cfg, cfg.rcfg.asset_paths, cfg.rcfg.additional_mats,
        cfg.rcfg.additional_textures,
    )
    scene = bake_scene(assets)
    state0 = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)
    log(f"texels={int(scene.tex_data.shape[0])}")

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def rollout(st, sc, n):
        def body(s, _):
            s = dataclasses.replace(s, time=s.time + 0.05)
            f = raytrace(s, sc, height=64, width=64)
            return s, f.rgb
        s, stack = jax.lax.scan(body, st, None, length=n)
        return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

    st = jax.tree.map(jnp.copy, state0)
    n_small, n_big = 4, 12
    st, ck = rollout(st, scene, n_small)
    float(np.asarray(ck))
    st, ck = rollout(st, scene, n_big)
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
    if per <= 0:
        per = tb / n_big
    log(f"tex64 resident 64²: {worlds / per:,.0f} frames/s "
        f"({per * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
