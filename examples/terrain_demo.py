"""Terrain demo — the round-3 scale features through the public API:
a ~100k-triangle heightfield per world (DMA-streamed big-mesh path), a
256×256 texture (mip chain + paged texel pool), camera orbit, tiled PNG
dump.

The reference exercises scale through its Vulkan raster path on
arbitrary meshes (`src/mgr.cpp:543-545`) and any-size texture tables
(`src/mgr.cpp:199-212`); this demo drives this package's TPU
equivalents: the deferred split-layout DMA triangle sweep and the paged
in-kernel sampler (docs/benchmarks.md "scale frontier" rows).

Run:  python examples/terrain_demo.py --worlds 4 --steps 8
      (CPU-safe at small sizes; on a TPU try --worlds 32 --res 256)
"""

import argparse
import math
import os
import sys
import tempfile

import numpy as np

# Runnable without an editable install: `python examples/terrain_demo.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu through the config flag — the axon TPU plugin
# ignores the env var, and a bare example run would otherwise become a
# second client of the single-client TPU tunnel (see examples/smoke.py).
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import madrona_renderer_tpu as m


def heightfield(grid: int):
    """Rolling-hills triangle soup [N, 3] + per-vertex UVs [N, 2]."""
    xs = np.linspace(-40.0, 40.0, grid + 1, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    zz = (
        3.0 * np.sin(xx * 0.15) * np.cos(yy * 0.17)
        + 1.2 * np.sin(xx * 0.55 + 1.3) * np.sin(yy * 0.43)
    ).astype(np.float32)
    verts = np.stack([xx, yy, zz], axis=-1)  # [g+1, g+1, 3]
    uv = np.stack([(xx + 40.0) / 80.0, (yy + 40.0) / 80.0], -1).astype(np.float32)

    a = verts[:-1, :-1]
    b = verts[1:, :-1]
    c = verts[:-1, 1:]
    d = verts[1:, 1:]
    ua, ub, uc, ud = uv[:-1, :-1], uv[1:, :-1], uv[:-1, 1:], uv[1:, 1:]
    tris = np.concatenate(
        [
            np.stack([a, b, d], axis=2).reshape(-1, 3, 3),
            np.stack([a, d, c], axis=2).reshape(-1, 3, 3),
        ]
    ).reshape(-1, 3)
    uvs = np.concatenate(
        [
            np.stack([ua, ub, ud], axis=2).reshape(-1, 3, 2),
            np.stack([ua, ud, uc], axis=2).reshape(-1, 3, 2),
        ]
    ).reshape(-1, 2)
    return tris, uvs


def checker_png(size: int) -> str:
    """Write a size×size two-tone checker PNG; return its path."""
    from madrona_renderer_tpu.assets.png import write_png

    yy, xx = np.mgrid[0:size, 0:size]
    cell = max(1, size // 16)
    mask = ((xx // cell + yy // cell) % 2).astype(np.uint8)
    img = np.empty((size, size, 4), np.uint8)
    img[..., 0] = np.where(mask, 205, 72)
    img[..., 1] = np.where(mask, 180, 110)
    img[..., 2] = np.where(mask, 120, 62)
    img[..., 3] = 255
    path = os.path.join(tempfile.gettempdir(), f"mrt_terrain_checker_{size}.png")
    write_png(path, img)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=4)
    ap.add_argument("--grid", type=int, default=64,
                    help="heightfield cells per side (224 ≈ 100k tris)")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--tex", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/terrain_demo")
    args = ap.parse_args()

    tris, uvs = heightfield(args.grid)
    print(f"terrain: {len(tris) // 3} triangles/world, {args.tex}² texture")

    pitch = -0.5
    ps, pc = math.sin(pitch / 2), math.cos(pitch / 2)
    r = m.MadronaRenderer(
        gpu_id=0,
        num_worlds=args.worlds,
        render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=args.res,
        batch_render_view_height=args.res,
        mesh_vertices=tris,
        mesh_uvs=uvs,
        mesh_indices=np.arange(len(tris), dtype=np.uint32),
        mesh_vertex_offsets=np.asarray([0], np.uint32),
        mesh_indices_offsets=np.asarray([0], np.uint32),
        mesh_materials=np.asarray([0], np.int32),
        materials=[m.AdditionalMaterial(color=[1, 1, 1, 1], texture_id=0)],
        texture_paths=[checker_png(args.tex)],
        instances=[
            m.ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                               scale=[1, 1, 1], object_id=0)
        ],
        cameras=[
            m.ImportedCamera(position=[0.0, 30.0, 14.0],
                             rotation=[pc, ps, 0.0, 0.0])
        ],
        worlds=[
            m.WorldInit(num_instances=1, instance_offset=0,
                        num_cameras=1, camera_offset=0)
            for _ in range(args.worlds)
        ],
    )

    # Orbit the cameras a little each step (in-place tensor mutation —
    # the reference's scripts/test.py interaction contract).
    pos = r.camera_position_tensor().to_torch()
    for i in range(args.steps):
        ang = 0.08 * (i + 1)
        for w in range(args.worlds):
            pos[w][0] = 30.0 * math.sin(ang + w * 0.3)
            pos[w][1] = 30.0 * math.cos(ang + w * 0.3)
        r.step()

    rgb = r.rgb_tensor().numpy()
    from madrona_renderer_tpu.runners.dump import dump_tiled_image

    out = dump_tiled_image(args.out, rgb)
    print(f"wrote {out} ({rgb.shape[0]} worlds at {args.res}²)")


if __name__ == "__main__":
    main()
