"""Big-texture throughput: the paged mip path vs the round-2 cliff.

VERDICT r2 item 2 'Done' condition: a 256×256-texture north-star config
(4096 worlds, 64×64 rt) at ≥50% of untextured (round 2: the >16k-texel
pool fell back to the XLA gather epilogue at ~10k f/s = 2%).

Usage: python -u tools/tpu_paged_tex_bench.py [--worlds 4096]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def build_scene(num_worlds: int, tex_size: int, mipmaps):
    import numpy as np

    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.assets.png import encode_png
    from madrona_renderer_tpu.config import (
        AdditionalMaterial, GeometryConfig, ImportedCamera,
        ImportedInstance, WorldInit,
    )
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.runners.scenes import cube_mesh, plane_mesh

    from madrona_renderer_tpu.runners.scenes import _cache_dir

    yy, xx = np.mgrid[0:tex_size, 0:tex_size]
    checker = ((yy // 8 + xx // 8) % 2).astype(np.float32)
    img = np.empty((tex_size, tex_size, 4), np.uint8)
    img[..., 0] = (255 * (0.35 + 0.6 * checker)).astype(np.uint8)
    img[..., 1] = (255 * (0.55 - 0.25 * checker)).astype(np.uint8)
    img[..., 2] = (255 * (0.25 + 0.5 * (1 - checker))).astype(np.uint8)
    img[..., 3] = 255
    path = os.path.join(_cache_dir(), f"mrt_paged_{tex_size}.png")
    with open(path, "wb") as f:
        f.write(encode_png(img))

    cube_v, cube_uv = cube_mesh()
    plane_v, plane_uv = plane_mesh()
    meshes = [cube_v, plane_v]
    uvs = [cube_uv, plane_uv * 4.0]
    counts = [len(m) for m in meshes]
    offs = np.cumsum([0] + counts[:-1]).astype(np.uint32)
    geo = GeometryConfig(
        vertices=np.concatenate(meshes),
        uvs=np.concatenate(uvs),
        indices=np.concatenate(
            [np.arange(c, dtype=np.uint32) for c in counts]
        ),
        mesh_vertex_offsets=offs,
        mesh_index_offsets=offs.copy(),
        mesh_materials=np.asarray([0, 1], np.int32),
    )
    mats = [
        AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0),
        AdditionalMaterial(color=(0.9, 0.85, 0.8, 1.0), texture_id=0),
    ]
    instances, cameras, worlds = [], [], []
    for w in range(num_worlds):
        instances.append(
            ImportedInstance(position=[0, 6, 1.2], rotation=[1, 0, 0, 0],
                             scale=[2, 2, 2], object_id=0))
        instances.append(
            ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=1))
        cameras.append(
            ImportedCamera(position=[0, 0, 2], rotation=[1, 0, 0, 0]))
        worlds.append(WorldInit(num_instances=2, instance_offset=2 * w,
                                num_cameras=1, camera_offset=w))
    merged = load_render_assets(geo, [], mats, [path])
    scene = bake_scene(merged, mipmaps=mipmaps)
    state = init_state(instances, cameras, worlds)
    return state, scene


def measure(step, state, scene, worlds):
    import jax
    import jax.numpy as jnp
    import numpy as np

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def rollout(st, sc, n):
        def body(s, _):
            half = jnp.float32(0.01)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)],
                           jnp.float32)
            from madrona_renderer_tpu.ops.quat import (
                quat_multiply, quat_normalize,
            )
            s = dataclasses.replace(
                s, time=s.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, s.instance_rot)),
            )
            f = step(s, sc)
            return s, f.rgb
        s, stack = jax.lax.scan(body, st, None, length=n)
        return s, jnp.sum(stack[:, 0, ::16].astype(jnp.int32))

    st = jax.tree.map(jnp.copy, state)
    n_small, n_big = 2, 8
    for n in (n_small, n_big):
        st, ck = rollout(st, scene, n)
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
    return worlds / per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import numpy as np

    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    log(f"devices: {jax.devices()}")

    def rt(st, sc):
        return raytrace(st, sc, height=64, width=64)

    def rt_tri(st, sc):
        return raytrace(st, sc, height=64, width=64,
                        texture_filter="trilinear")

    # Correctness first: paged vs jnp ref on a tiny fleet.
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_ref

    st2, sc2 = build_scene(2, 256, "auto")
    fa = rt(st2, sc2)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        fb = rt_ref(jax.device_put(st2, cpu), jax.device_put(sc2, cpu),
                    height=64, width=64)
    d = np.abs(np.asarray(fa.rgb, np.int16) - np.asarray(fb.rgb, np.int16))
    frac = float((d.max(axis=-1) > 2).mean())
    log(f"paged 256² correctness: max|d|={d.max()} frac>2={frac:.4f} "
        f"coverage={float((np.asarray(fa.segmask) >= 0).mean()):.2f}")

    for name, tex, mips, step in (
        ("tex32_resident", 32, "auto", rt),
        ("tex256_paged", 256, "auto", rt),
        ("tex256_trilinear", 256, "auto", rt_tri),
        ("tex256_cliff_r2", 256, False, rt),
    ):
        state, scene = build_scene(args.worlds, tex, mips)
        L = int(scene.tex_mip_offset.shape[1])
        log(f"{name}: pool={int(scene.tex_data.shape[0])} texels L={L} "
            "compiling...")
        fps = measure(step, state, scene, args.worlds)
        log(f"{name}: {fps:,.0f} frames/s")


if __name__ == "__main__":
    main()
