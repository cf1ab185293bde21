"""End-to-end smoke example — a 1:1 port of the reference's
``scripts/test.py`` (reference ``scripts/test.py:1-163``) to this package:
4 worlds, a disk cube asset + manually-specified triangle mesh, 1 material +
texture, 2 instances + 1 camera per world, 128 raytraced 64x64 steps with
per-step transform mutation through the exported tensor, matplotlib grid
display (or PNG dump with --no-display).
"""

import argparse
import math
import os
import sys

import numpy as np

# Runnable without an editable install: `python examples/smoke.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var, so a
# JAX_PLATFORMS=cpu example run would silently become a SECOND client
# of the single-client TPU tunnel (and a test-runner timeout would then
# kill it mid-execution — the tunnel-wedge mechanism, CLAUDE.md).
# Honor the env var through the config flag, which the plugin respects.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import madrona_renderer_tpu as m

DATA = os.environ.get(
    "MRT_DATA_DIR", os.path.join(os.path.dirname(__file__), "..", "tests", "_fixtures")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-display", action="store_true")
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(DATA, "cube.obj")):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tests.fixtures import ensure_fixtures

        ensure_fixtures()

    # Object IDs: disk assets first, then raw meshes — cube=0, triangle=1.
    asset_paths = [m.ImportedAsset(path=os.path.join(DATA, "cube.obj"), mat_id=0)]
    additional_mats = [
        m.AdditionalMaterial(color=[1, 1, 1, 1], texture_id=0, roughness=0.8, metalness=0.2)
    ]
    texture_paths = [os.path.join(DATA, "cube.png")]
    instances = [
        m.ImportedInstance(position=[0.0, 0.0, 15.0],
                           rotation=[0.707107, 0.707107, 0.0, 0.0],  # w, x, y, z
                           scale=[3.0, 3.0, 3.0], object_id=0),
        m.ImportedInstance(position=[0.0, 0.0, 15.0],
                           rotation=[0.707107, 0.707107, 0.0, 0.0],
                           scale=[10.0, 10.0, 10.0], object_id=1),
    ]
    cameras = [
        m.ImportedCamera(position=[-22.343935, -21.845375, 27.061676],
                         rotation=[0.913407, -0.112268, 0.047731, -0.388336])
    ]
    num_worlds = 4
    world_inits = [
        m.WorldInit(num_instances=2, instance_offset=0, num_cameras=1, camera_offset=0)
        for _ in range(num_worlds)
    ]

    vertices = np.array([[0, 0, 0], [5, 0, 10], [10, 0, 0]], np.float32)
    uvs = np.zeros((3, 2), np.float32)
    indices = np.array([0, 1, 2], np.uint32)

    renderer = m.MadronaRenderer(
        gpu_id=0, num_worlds=num_worlds, render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=64, batch_render_view_height=64,
        asset_paths=asset_paths, mesh_vertices=vertices, mesh_uvs=uvs,
        mesh_indices=indices,
        mesh_vertex_offsets=np.array([0], np.uint32),
        mesh_indices_offsets=np.array([0], np.uint32),
        mesh_materials=np.array([-1], np.int32),
        instances=instances, materials=additional_mats,
        texture_paths=texture_paths, cameras=cameras, worlds=world_inits,
    )

    positions = renderer.instance_position_tensor().to_torch()
    grid_h = math.ceil(math.sqrt(num_worlds))
    grid_w = math.ceil(num_worlds / grid_h)

    plt = None
    if not args.no_display:
        import matplotlib.pyplot as plt

        plt.ion()
        fig, axes = plt.subplots(grid_w, grid_h, figsize=(10, 10))

    for step in range(args.steps):
        positions[0][2] += 1.0
        positions[1][2] += 2.0
        positions[2][2] += 1.5
        positions[3][2] += 0.5

        renderer.step()
        rgb = renderer.rgb_tensor().to_torch().cpu()

        if plt is not None:
            for y in range(grid_h):
                for x in range(grid_w):
                    idx = x + y * grid_w
                    if idx < num_worlds:
                        ax = axes[x, y]
                        ax.imshow(rgb[idx])
                        ax.axis("off")
            plt.pause(0.01)

    if args.no_display:
        from madrona_renderer_tpu.runners.dump import dump_tiled_image

        out = dump_tiled_image("/tmp/smoke_example", rgb.numpy())
        print(f"final frame sheet: {out}")


if __name__ == "__main__":
    main()
