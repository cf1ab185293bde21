"""Large-mesh benchmark: cluster culling on a 10k-triangle terrain.

The reference-scale scenes (tens of triangles) don't exercise the
acceleration structure; this does — a procedural heightfield terrain
(~10k triangles, 81 Morton clusters) plus a cube, many worlds. Compares
the culled kernel against brute force on-chip.
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


def terrain_mesh(n: int = 72, extent: float = 40.0, amp: float = 1.5):
    """Heightfield grid: n x n quads → 2·n² triangles."""
    import numpy as np

    xs = np.linspace(-extent, extent, n + 1)
    ys = np.linspace(-extent, extent, n + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    gz = amp * (np.sin(gx * 0.3) * np.cos(gy * 0.23) + 0.3 * np.sin(gy * 0.7))
    verts = np.stack([gx, gy, gz], axis=-1).astype(np.float32)  # [n+1, n+1, 3]
    tris = []
    for i in range(n):
        for j in range(n):
            a = verts[i, j]
            b = verts[i + 1, j]
            c = verts[i + 1, j + 1]
            d = verts[i, j + 1]
            tris += [a, b, c, a, c, d]
    return np.asarray(tris, np.float32)


def build_scene(num_worlds: int):
    import math

    import numpy as np

    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.config import (
        AdditionalMaterial, GeometryConfig, ImportedCamera, ImportedInstance,
        WorldInit,
    )
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.runners.scenes import cube_mesh

    terrain = terrain_mesh()
    cube_v, _ = cube_mesh()
    meshes = [terrain, cube_v]
    counts = [len(m) for m in meshes]
    offs = np.cumsum([0] + counts[:-1]).astype(np.uint32)
    geo = GeometryConfig(
        vertices=np.concatenate(meshes),
        uvs=np.zeros((sum(counts), 2), np.float32),
        indices=np.concatenate([np.arange(c, dtype=np.uint32) for c in counts]),
        mesh_vertex_offsets=offs,
        mesh_index_offsets=offs.copy(),
        mesh_materials=np.asarray([0, 1], np.int32),
    )
    mats = [
        AdditionalMaterial(color=(0.35, 0.5, 0.3, 1.0)),
        AdditionalMaterial(color=(0.9, 0.3, 0.2, 1.0)),
    ]
    instances, cameras, worlds = [], [], []
    pitch = -0.25
    ps, pc = math.sin(pitch / 2), math.cos(pitch / 2)
    for w in range(num_worlds):
        instances.append(ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                                          scale=[1, 1, 1], object_id=0))
        instances.append(ImportedInstance(position=[0, 0, 2.5], rotation=[1, 0, 0, 0],
                                          scale=[2, 2, 2], object_id=1))
        cameras.append(ImportedCamera(position=[0.0, 14.0, 6.0],
                                      rotation=[0.0, 0.0, ps, pc]))
        worlds.append(WorldInit(num_instances=2, instance_offset=2 * w,
                                num_cameras=1, camera_offset=w))
    merged = load_render_assets(geo, [], mats, [])
    scene = bake_scene(merged)
    state = init_state(instances, cameras, worlds)
    return state, scene


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from madrona_renderer_tpu.ops.quat import quat_multiply, quat_normalize
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace

    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    state, scene = build_scene(worlds)
    S = state.instance_obj.shape[1] * scene.tris_per_object
    log(f"{worlds} worlds, soup S={S} triangles/world, "
        f"{scene.cl_valid.shape[1]} clusters/object x {scene.tris_per_object // scene.cl_valid.shape[1]} tris")

    def make_step(accel):
        @jax.jit
        def step(st, sc):
            half = jnp.float32(0.01)
            dq = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
            st = dataclasses.replace(
                st, time=st.time + 0.05,
                instance_rot=quat_normalize(quat_multiply(dq, st.instance_rot)),
            )
            return st, raytrace(st, sc, height=64, width=64, accel=accel)
        return step

    def measure(step, n_small=3, n_big=10):
        @partial(jax.jit, static_argnames=("n",))
        def rollout(st, sc, n):
            def body(s, _):
                s, frames = step(s, sc)
                return s, frames.rgb
            st2, stack = jax.lax.scan(body, st, None, length=n)
            return st2, stack, jnp.sum(stack[:, 0].astype(jnp.int32))

        st = state
        for n in (n_small, n_big):
            st, _, ck = rollout(st, scene, n)
            float(np.asarray(ck))
        t0 = time.perf_counter()
        st, _, ck = rollout(st, scene, n_small)
        float(np.asarray(ck))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        st, _, ck = rollout(st, scene, n_big)
        float(np.asarray(ck))
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (n_big - n_small)
        return per

    # Correctness spot-check vs CPU first (small).
    small_state, small_scene = build_scene(2)
    f_tpu = raytrace(small_state, small_scene, height=64, width=64)
    tpu_rgb = np.asarray(f_tpu.rgb)
    cpu = jax.devices("cpu")[0]
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_cpu

    with jax.default_device(cpu):
        f_cpu = rt_cpu(jax.device_put(small_state, cpu), jax.device_put(small_scene, cpu),
                       height=64, width=64)
    diff = np.abs(tpu_rgb.astype(np.int16) - np.asarray(f_cpu.rgb).astype(np.int16))
    cov = (np.asarray(f_tpu.segmask) >= 0).mean()
    log(f"correctness: max LSB diff {diff.max()}, coverage {cov:.2f}")

    per = measure(make_step("clusters"))
    log(f"accel=clusters: {per*1000:.2f} ms/step → {worlds/per:,.0f} frames/s")
    log("DONE")


if __name__ == "__main__":
    main()
