"""Output frame pytree.

The analog of the reference's ``RaycastOutputArchetype`` export columns —
RGB (u8 RGBA), depth (f32), segmask (i32) per view (reference
``src/sim.cpp:52-60``) — as plain returned arrays. Shapes keep the padded
``[worlds, cameras, H, W, ...]`` layout internally; the flat
``[total_cams, ...]`` tensors of the public API are views (see
``madrona_renderer_tpu.manager``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Frames:
    rgb: jax.Array  # u8 [W, C, H, Wd, 4]
    depth: jax.Array  # f32 [W, C, H, Wd]
    segmask: jax.Array  # i32 [W, C, H, Wd]  (-1 = miss / not applicable)
