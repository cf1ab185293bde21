"""Supersampled antialiasing (SSAA) — a beyond-reference quality tier.

The reference point-samples one ray per pixel (one ray per output texel,
reference ``src/mgr.cpp:443-492``), so silhouette edges alias hard at the
low RL resolutions it targets. ``Manager(ssaa=s)`` renders every view at
``s x`` resolution and box-filters it back down:

 * **rgb** — exact integer box filter over the ``s*s`` subsamples
   (round-half-up; sums fit i32 for any practical ``s``).
 * **depth / segmask** — the center subsample. Instance IDs cannot be
   averaged, and blending depth across a silhouette would fabricate
   mid-air surfaces, so both stay point-sampled — mutually consistent,
   at the subsample nearest the pixel center.

Rays are generated at subpixel centers ``(i + 0.5) / (s*H)``, so the
``s*s`` subsamples tile each output pixel uniformly: rendering at ``s x``
and filtering is the textbook supersample of the same camera frustum.

TPU note: the supersampled render dominates (s^2 more rays); the filter
itself is a reshape+sum XLA fuses into the kernel epilogue. Composes
with ``warmstart=True`` because the warm-start seed is
correctness-independent (ops/warmstart.py): the fed-back low-res depth
is nearest-upsampled into the seed, and edge subpixels whose true depth
exceeds the seeded window simply ride the repair pass.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.frames import Frames


def downsample_frames(frames: Frames, s: int) -> Frames:
    """Box-filter ``s x``-supersampled frames to output resolution."""
    if s <= 1:
        return frames
    rgb = frames.rgb  # u8 [W, C, H*s, Wd*s, 4]
    w, c, hs, ws, ch = rgb.shape
    h, wd = hs // s, ws // s
    acc = rgb.astype(jnp.int32).reshape(w, c, h, s, wd, s, ch).sum(axis=(3, 5))
    n = s * s
    rgb8 = ((acc + n // 2) // n).astype(jnp.uint8)
    mid = s // 2
    depth = frames.depth.reshape(w, c, h, s, wd, s)[:, :, :, mid, :, mid]
    seg = frames.segmask.reshape(w, c, h, s, wd, s)[:, :, :, mid, :, mid]
    return dataclasses.replace(frames, rgb=rgb8, depth=depth, segmask=seg)


def upsample_depth(depth: jnp.ndarray, s: int) -> jnp.ndarray:
    """Nearest-upsample a [W, C, H, Wd] depth map by ``s`` on both image
    axes (the warm-start seed for a supersampled render)."""
    if s <= 1:
        return depth
    return jnp.repeat(jnp.repeat(depth, s, axis=2), s, axis=3)
