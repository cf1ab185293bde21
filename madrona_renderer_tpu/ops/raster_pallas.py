"""Batch rasterizer — Pallas TPU path.

The raster-convention renderer now lives alongside the raytracer in
``raytrace_pallas.py`` (same kernel produces both t and camera-plane z);
this module re-exports it for the backend registry. See raster_ref.py for
the raster-semantics rationale and reference citations.
"""

from .raytrace_pallas import rasterize

__all__ = ["rasterize"]
