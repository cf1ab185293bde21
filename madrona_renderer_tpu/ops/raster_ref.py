"""Batch rasterizer — pure jax.numpy implementation.

Re-creates the semantics of the reference's Vulkan batch rasterizer
(``RenderManager`` with ``enableBatchRenderer``, RGBD mode — reference
``src/mgr.cpp:99-110``; per-step ``readECS()`` + ``batchRender()``,
``src/mgr.cpp:533-545``): per-view RGBA8 color and f32 depth, one
directional light, view parameters fov=90° / znear=1e-3 from
``attachEntityToView`` (``src/sim.cpp:168-171``), and *no* segmentation
output (parity with the raster branch of ``segmaskTensor``,
``src/mgr.cpp:592-595``).

TPU-first design note: a hardware rasterizer exists to exploit
triangle-local coherence on wide scan-out units; on TPU, visibility for
batch-RL-scale scenes (few instances, small views) is fastest as the same
vectorized ray-vs-triangle sweep the raytracer uses. Rasterization and ray
casting agree exactly on visibility for the same camera model — what
differs is the projection convention. So this module shares the brute-force
intersector and differs where raster semantics differ:

  * **depth** is forward (camera-plane) distance ``z_cam``, not ray length
    — the z-buffer value a rasterizer interpolates, linearized;
  * **clip range** uses the view's znear (0.001) rather than the
    raytracer's 0.1 (reference values: ``src/sim.cpp:170`` vs
    ``src/mgr.cpp:477``);
  * **segmask** is not produced.

A tile-binned Pallas rasterizer (transform → bin → per-tile z-test) is the
planned optimization for large triangle counts; it slots in behind the same
signature.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.frames import Frames
from ..core.scene import SceneData
from ..core.state import SimState
from ..utils.precision import f32_precise
from .quat import quat_rotate
from .raytrace_ref import (
    build_world_soup,
    camera_ray_dirs,
    finish_frames,
    intersect_bruteforce,
)


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "fov_y_degrees", "chunk", "texture_filter", "shadows",
        "watertight",
    ),
)
@f32_precise
def _rasterize_jit(
    state: SimState,
    scene: SceneData,
    *,
    height: int,
    width: int,
    near: float = 0.001,
    far: float = 1000.0,
    fov_y_degrees: float = 90.0,
    chunk: int = 16,
    texture_filter: str = "nearest",
    shadows: bool = False,
    watertight: bool = False,
) -> Frames:
    soup = build_world_soup(state, scene)
    W, C = state.camera_pos.shape[:2]

    eff_fov = jnp.where(state.camera_fov > 0, state.camera_fov, fov_y_degrees)
    eff_near = jnp.where(state.camera_znear > 0, state.camera_znear, near)
    dirs = camera_ray_dirs(state.camera_rot, height, width, eff_fov)
    # Forward axis per camera: local +Y.
    fwd = quat_rotate(state.camera_rot, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    # cos(angle to forward) per pixel; z_cam = t * cosf. A z-buffer
    # rasterizer clips fragments with z < znear BEFORE the depth test, so
    # the near bound must exclude pre-near hits from the min-t competition:
    # pass the exact per-pixel t-space bound znear / cosf. (Fixed in r2 —
    # previously a nearer-than-near hit blanked the pixel even when a
    # farther in-range fragment existed.)
    cosf = jnp.einsum("wcpk,wck->wcp", dirs, fwd)
    t_min = eff_near[:, :, None] / jnp.maximum(cosf, 1e-6)  # [W, C, P]
    # t search window must cover z < far for the worst-case (corner) ray:
    # t = z / cosf with cos_min = 1/sqrt(1 + tan_x^2 + tan_y^2).
    tan_y = jnp.tan(jnp.deg2rad(eff_fov) * 0.5)
    tan_x = tan_y * (width / height)
    t_far = far * jnp.sqrt(1.0 + tan_x * tan_x + tan_y * tan_y)  # [W, C]
    if watertight:
        from .watertight import intersect_watertight as _intersect
    else:
        _intersect = intersect_bruteforce
    t, idx, hit = _intersect(
        soup,
        state.camera_pos,
        dirs,
        t_min,
        t_far,
        chunk=chunk,
    )
    z = t * cosf
    geo_hit = hit  # pre-far-clip (the mip tile clamp keys on this)
    hit = hit & (z < far)  # near handled exactly in t-space above

    lit = None
    if shadows:
        from .raytrace_ref import compute_lit

        points = state.camera_pos[:, :, None, :] + t[..., None] * dirs
        lit = compute_lit(soup, scene, points, t)

    # No segmask under raster (reference FATALs; our Manager raises).
    return finish_frames(
        soup, state, scene, dirs, idx, hit, z,
        height=height, width=width, texture_filter=texture_filter,
        with_segmask=False, lit=lit,
        mip_t=t, mip_fov=eff_fov, mip_hit=geo_hit,
    )


def rasterize(
    state: SimState,
    scene: SceneData,
    *,
    watertight: "bool | None" = None,
    **kw,
) -> Frames:
    """Render every (world, camera) view with raster conventions.

    Thin unjitted wrapper (mirrors raytrace_ref.raytrace): the
    ``watertight`` choice — including its MRT_WATERTIGHT env default —
    resolves BEFORE the jit boundary so the trace cache keys on it."""
    if watertight is None:
        import os

        watertight = os.environ.get("MRT_WATERTIGHT", "0") == "1"
    return _rasterize_jit(state, scene, watertight=bool(watertight), **kw)
