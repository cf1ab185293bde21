"""Tiled frame dump: N views → one contact-sheet PNG.

Re-creates ``run::dumpTiledImage`` (reference ``src/dump.cpp:45-119``):
tile ⌈√N⌉ images per column into a grid and write a PNG. Depth images are
normalized to grayscale u8 with the reference's ``min(depth/255, 1)`` rule
(``src/dump.cpp:23-43``).

Documented divergence: the reference's raw image buffers are x/y transposed
and its dump un-transposes them (``src/dump.cpp:9-21``); our buffers are
already natural row-major [H, W], so no transpose pass exists.
"""

from __future__ import annotations

import math

import numpy as np

from ..assets.png import write_png


def depth_to_gray_u8(depth: np.ndarray) -> np.ndarray:
    """f32 depth [.., H, W] → RGBA8 grayscale, reference normalization
    (src/dump.cpp:30-42: u8 = 255 * min(depth / 255, 1))."""
    d = np.minimum(depth / 255.0, 1.0)
    g = (255.0 * d).astype(np.uint8)
    out = np.stack([g, g, g, np.full_like(g, 255)], axis=-1)
    return out


def tile_images(images: np.ndarray) -> np.ndarray:
    """[N, H, W, 4] u8 → single [gh*H, gw*W, 4] grid image.

    Grid shape matches the reference: height = ⌈√N⌉ rows of images,
    width = ⌈N / height⌉ (src/dump.cpp:73-78).
    """
    n, h, w, c = images.shape
    grid_h = math.ceil(math.sqrt(n))
    grid_w = math.ceil(n / grid_h)
    out = np.zeros((grid_h * h, grid_w * w, c), np.uint8)
    for i in range(n):
        gy, gx = divmod(i, grid_w)
        out[gy * h : (gy + 1) * h, gx * w : (gx + 1) * w] = images[i]
    return out


def dump_tiled_image(
    output_path: str,
    images: np.ndarray,
    color_type: str = "rgb",
) -> str:
    """Write a tiled contact sheet. ``images``: u8 RGBA [N, H, W, 4] for
    'rgb', or f32 [N, H, W] for 'depth'. Returns the written path
    (``output_path`` + '.png', matching src/dump.cpp:113)."""
    images = np.asarray(images)
    if color_type == "depth":
        images = depth_to_gray_u8(images)
    path = output_path + ".png"
    write_png(path, tile_images(images))
    return path
