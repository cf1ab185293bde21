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

2. **Triangles ≫ pixels** (large meshes): the tile-binned pass. Per step,
   ``band_cluster_bins`` projects every triangle cluster's world AABB to a
   conservative screen y-interval and builds per-band front-to-back
   cluster lists in dense XLA math (bands = the kernel's pixel tiles over
   the flattened pixel index, so binning is 1D — no atomics, no scatter,
   sort-by-distance instead of sort-by-tile-id). Each kernel program then
   sweeps only its band's bin, with the in-kernel slab test retained for
   the best_t occlusion bound. Same per-pixel math → exact parity with
   regime 1 and with the jnp reference (fuzz suite + on-chip checks).

Both regimes depth-test per pixel tile with triangles resident in SMEM or
DMA-streamed per cluster (meshes past the SMEM budget). ``rasterize`` is
the single entry point; ``accel='binned'`` forces regime 2, ``'clusters'``
regime 1, ``'auto'`` picks by cluster count × band count (measured
crossover on a 100k-triangle terrain: tie at 4 bands, +16% at 16, +20% at
64 — docs/benchmarks.md).
"""

from .raytrace_pallas import band_cluster_bins, rasterize

__all__ = ["rasterize", "band_cluster_bins"]
