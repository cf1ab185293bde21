"""Batch rasterizer — Pallas TPU path.

The reference's L5a is a Vulkan batch rasterizer (``render::RenderManager``
construction at reference ``src/mgr.cpp:99-110``, per-step ``readECS()`` +
``batchRender()`` at ``src/mgr.cpp:535-545``). A hardware rasterizer is a
*visibility algorithm* (which triangle owns each pixel, at what depth) plus
raster conventions (camera-plane z, z-space near/far clip, no segmask).
This module is the TPU-native redesign of that component; its architecture
has two regimes, selected automatically per scene:

1. **Pixels ≳ triangles** (RL-observation workloads: tiny meshes, huge
   world batches): point-sampled visibility IS ray casting — one ray per
   pixel center, min-t depth competition. The shared Pallas kernel in
   ``raytrace_pallas.py`` computes both parameterizations (ray t and
   camera-plane z) in one sweep; raster mode selects z semantics
   (``raster_clip``: exact per-pixel t-space znear bound ``znear/cosf``,
   z-space far clip, no segmask — matching the reference's rasterizer
   surface, which FATALs on segmask at ``src/mgr.cpp:595``).

2. **Triangles ≫ pixels** (large meshes): the tile-binned pass (round 3:
   2D). Per step, ``band_cluster_bins`` projects every triangle cluster's
   world AABB to conservative screen row *and column* intervals and
   builds per-tile front-to-back cluster lists in dense XLA math (tiles =
   (tile_sub × 128) screen rectangles for images ≥ 256 px wide, else
   flattened-index bands — no atomics, no scatter, sort by
   closest-approach distance instead of sort-by-tile-id). Each kernel
   program sweeps only its tile's bin with the slab test retained for the
   best_t occlusion bound, **stops as soon as no pixel's depth window can
   reach the current cluster** (the sort key lower-bounds every hit in a
   cluster, so nothing later can win), and — for DMA meshes — streams
   geometry through a double-buffered prefetch while attributes resolve
   once per visited cluster from a VMEM slab (the deferred split-layout
   sweep). Same per-pixel math → exact parity with regime 1 and with the
   jnp reference (fuzz suite + on-chip checks).

Both regimes depth-test per pixel tile with triangles resident in SMEM or
DMA-streamed per cluster (meshes past the SMEM budget). ``rasterize`` is
the single entry point; ``accel='binned'`` forces regime 2, ``'clusters'``
regime 1, ``'auto'`` picks by cluster count × tile count (measured on the
100k-triangle terrain at 512²: 29 → 63 f/s across the round-3 stages —
docs/benchmarks.md has the ablation).
"""

from functools import partial

import jax

from ..core.frames import Frames
from ..core.scene import SceneData
from ..core.state import SimState
from ..utils.precision import f32_precise
from .raytrace_pallas import _frames_from_core, band_cluster_bins, render_core

__all__ = ["rasterize", "band_cluster_bins"]


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "near", "far", "fov_y_degrees", "chunk",
        "interpret", "texture_filter", "accel", "shadows", "watertight",
    ),
)
@f32_precise
def rasterize(
    state: SimState,
    scene: SceneData,
    *,
    height: int,
    width: int,
    near: float = 0.001,
    far: float = 1000.0,
    fov_y_degrees: float = 90.0,
    chunk: int = 16,  # unused; signature parity with raster_ref
    interpret: bool = False,
    texture_filter: str = "nearest",
    accel: str = "auto",
    shadows: bool = False,
    watertight: bool = False,
) -> Frames:
    """Raster-convention rendering on the shared kernel (camera-plane
    depth, view znear clip, no segmask) — see raster_ref.py for the
    rationale and the module docstring for the two-regime design.
    ``watertight`` is a resolved bool (the Manager's
    ``_watertight_effective`` handles env/None defaults before this jit
    boundary)."""
    del chunk
    core, T = render_core(
        state, scene, height=height, width=width, near=near, far=far,
        fov_y_degrees=fov_y_degrees, interpret=interpret, accel=accel,
        raster_clip=True, texture_filter=texture_filter, shadows=shadows,
        watertight=watertight,
    )
    return _frames_from_core(
        core, T, scene, state, height, width, texture_filter,
        depth_key="z", far_clip=far, with_segmask=False,
        shadows=shadows, fov_y_degrees=fov_y_degrees,
    )
