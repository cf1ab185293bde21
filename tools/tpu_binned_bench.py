"""Tile-binned pass vs in-kernel cluster scan on a >=100k-tri-per-world
scene (VERDICT r1 #4 'Done' condition).

Scene: procedural sine terrain, 2*GRID^2 triangles per world (default
GRID=224 -> 100,352 tris), one camera per world. Multi-band images
(128x128 / 256x256) so screen-space binning has bands to split over.

One client process, flush-immediate logging (axon tunnel discipline).
Usage: python -u tools/tpu_binned_bench.py [--worlds 32] [--grid 224]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache (MRT_COMPILE_CACHE=0 disables): the
# measurement chains launch fresh short-lived clients, and in a degraded
# session a single terrain-config compile+warm has read 15 min — the
# cache cuts repeat-probe latency to seconds. Executables are identical,
# so timings are unaffected. Every tool importing this module inherits it.
from madrona_renderer_tpu.utils import compile_cache

compile_cache.enable()


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def terrain_mesh(n: int, extent: float = 24.0, amp: float = 2.0):
    import numpy as np

    xs = np.linspace(-extent, extent, n + 1)
    ys = np.linspace(-extent, extent, n + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    gz = amp * (np.sin(gx * 0.3) * np.cos(gy * 0.23) + 0.3 * np.sin(gy * 0.7))
    verts = np.stack([gx, gy, gz], axis=-1).astype(np.float32)  # [n+1,n+1,3]
    a = verts[:-1, :-1].reshape(-1, 3)
    b = verts[1:, :-1].reshape(-1, 3)
    c = verts[1:, 1:].reshape(-1, 3)
    d = verts[:-1, 1:].reshape(-1, 3)
    tris = np.stack([a, b, c, a, c, d], axis=1).reshape(-1, 3)
    return tris


def build_scene(num_worlds: int, grid: int):
    import numpy as np

    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.config import (
        AdditionalMaterial, GeometryConfig, ImportedCamera, ImportedInstance,
        WorldInit,
    )
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state

    terrain = terrain_mesh(grid)
    geo = GeometryConfig(
        vertices=terrain,
        uvs=np.zeros((len(terrain), 2), np.float32),
        indices=np.arange(len(terrain), dtype=np.uint32),
        mesh_vertex_offsets=np.asarray([0], np.uint32),
        mesh_index_offsets=np.asarray([0], np.uint32),
        mesh_materials=np.asarray([0], np.int32),
    )
    mats = [AdditionalMaterial(color=(0.35, 0.5, 0.3, 1.0))]
    instances, cameras, worlds = [], [], []
    pitch = -0.35
    ps, pc = math.sin(pitch / 2), math.cos(pitch / 2)
    for w in range(num_worlds):
        instances.append(ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                                          scale=[1, 1, 1], object_id=0))
        cameras.append(ImportedCamera(position=[0.0, 20.0, 8.0],
                                      rotation=[0.0, 0.0, ps, pc]))
        worlds.append(WorldInit(num_instances=1, instance_offset=w,
                                num_cameras=1, camera_offset=w))
    merged = load_render_assets(geo, [], mats, [])
    scene = bake_scene(merged)
    state = init_state(instances, cameras, worlds)
    return state, scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=32)
    ap.add_argument("--grid", type=int, default=224)
    ap.add_argument("--res", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--accel", nargs="*", default=["clusters", "binned"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")
    state0, scene = build_scene(args.worlds, args.grid)
    S = state0.instance_obj.shape[1] * scene.tris_per_object
    cc = state0.instance_obj.shape[1] * scene.cl_valid.shape[1]
    log(f"{args.worlds} worlds, S={S} tris/world, {cc} clusters/world")

    # Correctness: binned == clusters on-chip at the first config.
    r0 = args.res[0]
    fa = raytrace(state0, scene, height=r0, width=r0, accel="clusters")
    fb = raytrace(state0, scene, height=r0, width=r0, accel="binned")
    dr = np.abs(np.asarray(fa.rgb, np.int16) - np.asarray(fb.rgb, np.int16)).max()
    ds = np.array_equal(np.asarray(fa.segmask), np.asarray(fb.segmask))
    log(f"correctness {r0}px: rgb max|d|={dr} segmask={'OK' if ds else 'BAD'} "
        f"coverage={float((np.asarray(fa.segmask) >= 0).mean()):.2f}")

    for res in args.res:
        for accel in args.accel:
            @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
            def rollout(st, sc, n, _accel=accel, _res=res):
                def body(s, _):
                    half = jnp.float32(0.01)
                    dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                                   jnp.float32)
                    s = dataclasses.replace(
                        s, time=s.time + 0.05,
                        instance_rot=quat_normalize(
                            quat_multiply(dq, s.instance_rot)),
                    )
                    f = raytrace(s, sc, height=_res, width=_res, accel=_accel)
                    return s, f.rgb
                s, stack = jax.lax.scan(body, st, None, length=n)
                return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

            st = jax.tree.map(jnp.copy, state0)
            log(f"res={res} accel={accel}: compiling...")
            n_small, n_big = 2, 6
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
            log(f"res={res} accel={accel}: {args.worlds/per:,.1f} f/s "
                f"({per*1e3:.2f} ms/step, {per*1e3/args.worlds:.3f} ms/world)")


if __name__ == "__main__":
    main()
