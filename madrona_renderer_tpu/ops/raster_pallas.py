"""Batch rasterizer — Pallas-accelerated visibility.

Raster semantics (camera-plane depth, view znear, no segmask — see
raster_ref.py for the full convention rationale) on top of the Pallas
intersection kernel from raytrace_pallas.py. Tests pin exact output parity
with ``raster_ref.rasterize``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.frames import Frames
from ..core.scene import SceneData
from ..core.state import SimState
from .quat import quat_rotate
from .raytrace_ref import (
    build_world_soup,
    camera_ray_dirs,
    finish_frames,
)
from .raytrace_pallas import intersect_pallas


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "near", "far", "fov_y_degrees", "chunk", "interpret",
        "texture_filter",
    ),
)
def rasterize(
    state: SimState,
    scene: SceneData,
    *,
    height: int,
    width: int,
    near: float = 0.001,
    far: float = 1000.0,
    fov_y_degrees: float = 90.0,
    chunk: int = 16,  # unused; signature parity
    interpret: bool = False,
    texture_filter: str = "nearest",
) -> Frames:
    del chunk
    soup = build_world_soup(state, scene)
    W, C = state.camera_pos.shape[:2]

    dirs = camera_ray_dirs(state.camera_rot, height, width, fov_y_degrees)
    fwd = quat_rotate(state.camera_rot, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    cosf = jnp.einsum("wcpk,wck->wcp", dirs, fwd)
    # Clip on camera-plane z after intersecting with a widened t-window
    # (z = t·cosf; cosf ≥ cos(diag fov) > 0.5 for fov 90°).
    t, idx, hit = intersect_pallas(
        soup, state.camera_pos, dirs, near, far * 2.0, interpret=interpret
    )
    z = t * cosf
    hit = hit & (z > near) & (z < far)

    return finish_frames(
        soup, state, scene, dirs, idx, hit, z,
        height=height, width=width, texture_filter=texture_filter,
        with_segmask=False,
    )
