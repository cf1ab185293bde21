"""Batch raytracer — pure jax.numpy implementation.

This is the TPU-native re-creation of the reference's CUDA batch raytracer
(enabled under ``RenderMode::Raytracer``; configured with RGBD mode,
near=0.1, far=1000 at reference ``src/mgr.cpp:468-479``; outputs land in the
RGB/depth/segmask export columns, ``src/sim.cpp:52-60``).

Design (TPU-first, not a CUDA translation):
  * **TLAS = brute force over world-space triangles.** Per step the instance
    transforms are applied to each instance's (padded) object triangles,
    producing a per-world triangle soup ``[W, S, ...]`` with
    ``S = max_instances * tris_per_object``. Reference scenes are tiny
    (8-vertex cubes — ``data/*.obj``), so exhaustive intersection vectorizes
    perfectly over VPU lanes and pixel tiles; a BVH only pays off for large
    meshes (tracked for a later revision, per-mesh BLAS).
  * **Intersection is a scan over triangle chunks** carrying the running
    (min-t, argmin) per pixel. Static chunk size → static shapes → one XLA
    fusion per chunk; no data-dependent control flow.
  * **Shade-time recompute:** the scan carries only (t, best-index); hit
    attributes (barycentrics, UV, normal) are recomputed for the single best
    triangle per pixel after the scan. This keeps the hot loop's carry at 8
    bytes/pixel and replaces per-chunk gathers with one gather at the end.

The same function runs on CPU (tests/golden images) and TPU; the Pallas
kernel in ``raytrace_pallas.py`` is the optimized intersector with identical
semantics (cross-checked by tests).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.frames import Frames
from ..core.scene import SceneData
from ..core.state import SimState
from ..utils.precision import f32_precise
from .quat import quat_rotate
from .shade import shade_lambert

_EPS_DET = 1e-10
# Tiny barycentric slack so rays on a shared triangle edge hit at least one
# of the adjacent triangles (naive Möller–Trumbore is not watertight; the
# slack double-counts the edge instead of dropping it — min-t picks one).
_EPS_BARY = 1e-6


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TriangleSoup:
    """Per-world world-space triangles, ``[W, S, ...]``."""

    v0: jax.Array  # f32 [W, S, 3]
    e1: jax.Array  # f32 [W, S, 3]
    e2: jax.Array  # f32 [W, S, 3]
    uv0: jax.Array  # f32 [W, S, 2]
    duv1: jax.Array
    duv2: jax.Array
    n0: jax.Array  # f32 [W, S, 3]
    dn1: jax.Array
    dn2: jax.Array
    mat: jax.Array  # i32 [W, S]
    seg: jax.Array  # i32 [W, S] — per-world instance index (segmask value)
    valid: jax.Array  # f32 [W, S]
    # Texels-per-world-unit at the base mip (ops/mips.py) — drives mip
    # level selection; 0 for untextured/degenerate triangles.
    density: jax.Array  # f32 [W, S]


def planar_soup_parts(state: SimState, scene: SceneData, what: str = "all"):
    """Instance transforms × object triangles → world-space component
    PLANES ``[W, I, T]`` — the shared single source of truth for both the
    jnp reference soup (``build_world_soup`` stacks these) and the Pallas
    input pack (``raytrace_pallas._pack_rows_planar`` lays them out as
    SMEM rows), so the two paths evaluate identical expression trees and
    stay bitwise-comparable.

    Planar rationale (r4): the previous vector-form soup materialized ~9
    ``[W, S, 3]`` arrays whose 3-lane minor dim tile-pads 42× on TPU;
    the XLA input pack measured ~15% of the headline step (epilogue
    probe, docs/benchmarks.md). Component planes keep the minor dim at
    T and cut the padded gather traffic ~16×.

    The analog of the render-ECS instance gather + TLAS refit: the
    reference's render system collects (Position, Rotation, Scale,
    ObjectID) into instance buffers each step
    (``RenderingSystem::setupTasks``, reference ``src/sim.cpp:122-126``);
    here the gather *and* the transform fuse into the step's XLA program.

    Returns a dict of ``[W, I, T]`` planes: v0/e1/e2/n0/dn1/dn2 as
    (x, y, z) tuples, uv0/duv1/duv2 as (x, y), plus mat (i32), valid,
    density. ``what='geo'`` skips the normal/uv/density planes (the
    prep-constants pack needs only geometry)."""
    from .quat import quat_rotate_planar

    W, I = state.instance_obj.shape
    obj = state.instance_obj  # [W, I]
    n_obj = int(scene.tri_valid.shape[0])

    import os as _os

    if _os.environ.get("MRT_PACK_SELECT", "0") == "1" and n_obj <= 8:
        # Gather-free variant for the pack-cost A/B (r5): the chainK
        # probe put the XLA pack at ~15% of the headline step and the
        # planar rewrite showed the cost is the `arr[obj]` GATHER. With
        # few object types, an unrolled O-way select picks the exact
        # same values (bitwise — each lane copies one operand), fuses
        # into the surrounding elementwise tree, and never emits an XLA
        # gather op. Knob read at TRACE time (CLAUDE.md: clear caches
        # after flipping mid-process).
        def g(arr):  # [O, T, ...] object table → [W, I, T, ...]
            sel = obj.reshape(W, I, *([1] * (arr.ndim - 1)))
            acc = jnp.broadcast_to(arr[0], (W, I) + arr.shape[1:])
            for o in range(1, n_obj):
                acc = jnp.where(sel == o, arr[o], acc)
            return acc
    else:
        def g(arr):  # [O, T] object plane → [W, I, T]
            return arr[obj]

    def bi(x):  # [W, I] per-instance scalar → broadcast over T
        return x[:, :, None]

    pos = [bi(state.instance_pos[..., k]) for k in range(3)]
    rotq = [bi(state.instance_rot[..., k]) for k in range(4)]
    scale = [bi(state.instance_scale[..., k]) for k in range(3)]

    def rot3(v):
        return quat_rotate_planar(*rotq, *v)

    v0 = rot3([scale[k] * g(scene.v0[..., k]) for k in range(3)])
    v0 = tuple(v0[k] + pos[k] for k in range(3))
    e1 = rot3([scale[k] * g(scene.e1[..., k]) for k in range(3)])
    e2 = rot3([scale[k] * g(scene.e2[..., k]) for k in range(3)])
    valid = g(scene.tri_valid) * state.instance_valid[:, :, None]
    parts = dict(v0=v0, e1=e1, e2=e2, valid=valid, mat=g(scene.tri_mat))
    if what == "geo":
        return parts

    # Normals transform with inverse-transpose: rot * (n / scale).
    inv = [
        1.0 / jnp.maximum(jnp.abs(scale[k]), 1e-20)
        * jnp.sign(scale[k] + (scale[k] == 0))
        for k in range(3)
    ]
    parts["n0"] = rot3([g(scene.n0[..., k]) * inv[k] for k in range(3)])
    parts["dn1"] = rot3([g(scene.dn1[..., k]) * inv[k] for k in range(3)])
    parts["dn2"] = rot3([g(scene.dn2[..., k]) * inv[k] for k in range(3)])
    parts["uv0"] = (g(scene.uv0[..., 0]), g(scene.uv0[..., 1]))
    parts["duv1"] = (g(scene.duv1[..., 0]), g(scene.duv1[..., 1]))
    parts["duv2"] = (g(scene.duv2[..., 0]), g(scene.duv2[..., 1]))

    # Mip-level density (world-space, so instance scaling is exact) —
    # planar twin of ops/mips.soup_texel_density: same cross order, the
    # 3-term norm associating (x² + y²) + z².
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2
    cwx = e1y * e2z - e1z * e2y
    cwy = e1z * e2x - e1x * e2z
    cwz = e1x * e2y - e1y * e2x
    a_world = jnp.sqrt(cwx * cwx + cwy * cwy + cwz * cwz)
    tex_id = scene.mat_tex[parts["mat"]]
    du1x, du1y = parts["duv1"]
    du2x, du2y = parts["duv2"]
    a_uv = jnp.abs(du1x * du2y - du1y * du2x)
    tex_area = (
        a_uv
        * scene.tex_width[tex_id].astype(jnp.float32)
        * scene.tex_height[tex_id].astype(jnp.float32)
    )
    parts["density"] = jnp.sqrt(tex_area / jnp.maximum(a_world, 1e-30))
    return parts


def build_world_soup(state: SimState, scene: SceneData) -> TriangleSoup:
    """World-space triangle soup ``[W, S, ...]`` for the jnp reference
    path — a stack of ``planar_soup_parts`` (see there for the render-ECS
    reference anchor and the planar-layout rationale; the Pallas pack
    consumes the same parts, so reference and kernel stay bitwise-
    comparable)."""
    W, I = state.instance_obj.shape
    T = scene.tris_per_object
    S = I * T
    p = planar_soup_parts(state, scene)

    def fN(c):  # tuple of [W, I, T] planes → [W, S, len(c)]
        return jnp.stack(c, axis=-1).reshape(W, S, len(c))

    seg = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (W, I, T), 1), (W, I, T)
    )
    return TriangleSoup(
        v0=fN(p["v0"]), e1=fN(p["e1"]), e2=fN(p["e2"]),
        uv0=fN(p["uv0"]), duv1=fN(p["duv1"]), duv2=fN(p["duv2"]),
        n0=fN(p["n0"]), dn1=fN(p["dn1"]), dn2=fN(p["dn2"]),
        mat=p["mat"].reshape(W, S),
        seg=seg.reshape(W, S),
        valid=p["valid"].reshape(W, S),
        density=p["density"].reshape(W, S),
    )

def camera_ray_dirs(
    cam_rot: jnp.ndarray,  # f32 [..., 4]
    height: int,
    width: int,
    fov_y_degrees=90.0,  # float or f32 array broadcastable to cam_rot batch
) -> jnp.ndarray:
    """Unit ray directions [..., H*W, 3] for each camera.

    Camera local frame: +X right, +Y forward, +Z up (see ops/quat.py header
    for the derivation from the reference test camera). Pixel (0, 0) is the
    image's top-left; rays pass through pixel centers. ``fov_y_degrees`` may
    be per-camera (any shape broadcastable to the camera batch) — the
    reference pins fov at 90° (src/sim.cpp:168-171); ours generalizes.
    """
    batch = cam_rot.shape[:-1]
    fov = jnp.broadcast_to(jnp.asarray(fov_y_degrees, jnp.float32), batch)
    tan_y = jnp.tan(jnp.deg2rad(fov) * 0.5)[..., None]  # [..., 1]
    tan_x = tan_y * (width / height)
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height  # top→bottom
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ndc_x = xs * 2.0 - 1.0  # [-1, 1] left→right
    ndc_z = 1.0 - ys * 2.0  # [+1, -1] top→bottom
    gx = jnp.broadcast_to(ndc_x[None, :], (height, width)).reshape(-1)  # [P]
    gz = jnp.broadcast_to(ndc_z[:, None], (height, width)).reshape(-1)
    dx = gx * tan_x  # [..., P]
    dz = gz * tan_y
    local = jnp.stack([dx, jnp.ones_like(dx), dz], axis=-1)  # [..., P, 3]
    local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)
    # Broadcast rotate: cam_rot [..., 4] × local [..., P, 3] → [..., P, 3]
    rot = cam_rot.reshape(batch + (1, 4))
    return quat_rotate(rot, local)


def _moller_trumbore(orig, dirs, v0, e1, e2):
    """Möller–Trumbore. orig/dirs [..., 3] broadcast against v0/e1/e2 [..., 3].
    Returns (t, u, v, det)."""
    pvec = jnp.cross(dirs, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
    tvec = orig - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(dirs * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return t, u, v, det


def intersect_bruteforce(
    soup: TriangleSoup,
    orig: jnp.ndarray,  # f32 [W, C, 3]
    dirs: jnp.ndarray,  # f32 [W, C, P, 3]
    near,  # float | f32 [W, C] | f32 [W, C, P] (t-space lower bound)
    far,  # float | f32 [W, C]
    chunk: int = 512,
):
    """Min-t intersection of every ray against its world's soup.

    ``near`` may be per-camera or per-pixel: hits below it are excluded
    from the min-t competition (needed for exact z-buffer near-plane
    semantics in raster mode, where the bound is znear/cos per pixel).

    Returns (t [W, C, P], idx [W, C, P] into S, hit_mask [W, C, P]).

    TPU-friendly formulation: with a pinhole camera every ray of a view
    shares its origin, so Möller–Trumbore factors into per-(camera,
    triangle) 3-vectors computed once —

        tvec  = o − v0
        A     = e2 × tvec        (u numerator = d·A)
        B     = tvec × e1        (v numerator = d·B; t numerator = e2·B)
        D     = e2 × e1          (determinant = d·D)

    — leaving three ray-dependent dot products, expressed as einsums whose
    output layout is ``[W, C, S, pixel-chunk]``: pixels ride the 128-lane
    axis, triangles the sublane axis, so the whole epilogue (reciprocal,
    hit tests, min/argmin over S) is densely tiled VPU work. The scan over
    pixel chunks bounds live memory at ``O(W·C·S·chunk)`` regardless of
    image size.
    """
    W, S, _ = soup.v0.shape
    _, C, P, _ = dirs.shape
    chunk = max(128, min(chunk, P))
    n_chunks = -(-P // chunk)
    p_pad = n_chunks * chunk

    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    far_b = far[:, :, None, None] if far.ndim == 2 else far
    near_per_pixel = near.ndim == 3
    near_b = near[:, :, None, None] if near.ndim == 2 else near

    # Per-(camera, triangle) precompute — tiny ([W, C, S, 3]).
    tvec = orig[:, :, None, :] - soup.v0[:, None, :, :]  # [W, C, S, 3]
    e1 = soup.e1[:, None, :, :]
    e2 = soup.e2[:, None, :, :]
    A = jnp.cross(e2, tvec)
    B = jnp.cross(tvec, e1)
    # Determinant vector is camera-independent: [W, 1, S, 3].
    D = jnp.cross(soup.e2, soup.e1)[:, None, :, :]
    t_num = jnp.sum(e2 * B, axis=-1)  # [W, C, S]
    tri_ok = soup.valid[:, None, :] > 0.0  # [W, 1→C, S]

    # Pixel-chunked scan: xs [n_chunks, W, C, chunk, 3]
    d_pad = (
        jnp.pad(dirs, ((0, 0), (0, 0), (0, p_pad - P), (0, 0)), constant_values=1.0)
        if p_pad != P
        else dirs
    )
    xs = d_pad.reshape(W, C, n_chunks, chunk, 3).transpose(2, 0, 1, 3, 4)
    if near_per_pixel:
        n_pad = (
            jnp.pad(near, ((0, 0), (0, 0), (0, p_pad - P)), constant_values=jnp.inf)
            if p_pad != P
            else near
        )
        near_xs = n_pad.reshape(W, C, n_chunks, chunk).transpose(2, 0, 1, 3)
    else:
        # Scalar/per-camera bound: a trivial per-chunk carrier keeps one
        # scan body for both cases.
        near_xs = jnp.zeros((n_chunks, 1, 1, 1), jnp.float32)

    def scan_body(_, chunk_xs):
        d_chunk, near_chunk = chunk_xs
        # det/u_num/v_num: [W, C, S, chunk] — pixels on lanes.
        n_lo = near_chunk[:, :, None, :] if near_per_pixel else near_b
        det = jnp.einsum("wcpk,wcsk->wcsp", d_chunk, D)
        u_num = jnp.einsum("wcpk,wcsk->wcsp", d_chunk, A)
        v_num = jnp.einsum("wcpk,wcsk->wcsp", d_chunk, B)
        inv = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num[..., None] * inv
        ok = (
            (jnp.abs(det) > _EPS_DET)
            & (u >= -_EPS_BARY)
            & (v >= -_EPS_BARY)
            & (u + v <= 1.0 + _EPS_BARY)
            & (t > n_lo)
            & (t < far_b)
            & tri_ok[..., None]
        )
        t = jnp.where(ok, t, jnp.inf)
        best_t = jnp.min(t, axis=2)  # [W, C, chunk]
        best_idx = jnp.argmin(t, axis=2).astype(jnp.int32)
        return None, (best_t, best_idx)

    _, (t_chunks, idx_chunks) = jax.lax.scan(scan_body, None, (xs, near_xs))
    # [n_chunks, W, C, chunk] → [W, C, P]
    best_t = t_chunks.transpose(1, 2, 0, 3).reshape(W, C, p_pad)[:, :, :P]
    best_idx = idx_chunks.transpose(1, 2, 0, 3).reshape(W, C, p_pad)[:, :, :P]
    hit = jnp.isfinite(best_t)
    return jnp.where(hit, best_t, 0.0), jnp.where(hit, best_idx, 0), hit


# Self-shadow bias: a shadow ray from a hit point must travel at least
# SHADOW_EPS * (1 + primary_t) before an occluder counts — the hit point
# carries O(t·ulp) reconstruction error. (Beyond-reference feature: the
# reference's lighting is unshadowed direct lambert.)
SHADOW_EPS = 1e-3


def shadow_occlusion(
    soup: TriangleSoup,
    points: jnp.ndarray,  # f32 [W, C, P, 3] primary hit points
    sdir: jnp.ndarray,  # f32 [3] unit direction toward the light
    t_hit: jnp.ndarray,  # f32 [W, C, P] primary hit distances
    chunk: int = 128,
) -> jnp.ndarray:
    """Any-hit test along a shared direction from per-pixel origins →
    bool [W, C, P] (True = occluded).

    Directional lights keep the TPU-friendly structure even with
    per-pixel origins: the ray *direction* is shared, so ``pvec =
    sdir × e2``, the determinant, and its reciprocal are per-triangle
    scalars; only ``tvec`` and ``qvec`` are per-(pixel, triangle)."""
    W, S, _ = soup.v0.shape
    _, C, P, _ = points.shape
    chunk = max(1, min(chunk, P))
    n_chunks = -(-P // chunk)
    p_pad = n_chunks * chunk

    sdir = jnp.asarray(sdir, jnp.float32)
    pvec = jnp.cross(jnp.broadcast_to(sdir, soup.e2.shape), soup.e2)  # [W,S,3]
    det = jnp.sum(soup.e1 * pvec, axis=-1)  # [W, S]
    inv = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
    tri_ok = soup.valid > 0.0  # [W, S]

    pts = points
    th = t_hit
    if p_pad != P:
        pts = jnp.pad(points, ((0, 0), (0, 0), (0, p_pad - P), (0, 0)))
        th = jnp.pad(t_hit, ((0, 0), (0, 0), (0, p_pad - P)))
    xs_p = pts.reshape(W, C, n_chunks, chunk, 3).transpose(2, 0, 1, 3, 4)
    xs_t = th.reshape(W, C, n_chunks, chunk).transpose(2, 0, 1, 3)

    def scan_body(_, chunk_xs):
        p_chunk, t_chunk = chunk_xs  # [W, C, ch, 3], [W, C, ch]
        tv = p_chunk[:, :, :, None, :] - soup.v0[:, None, None, :, :]
        u = jnp.sum(tv * pvec[:, None, None, :, :], axis=-1) * inv[:, None, None, :]
        q = jnp.cross(tv, soup.e1[:, None, None, :, :])
        v = jnp.sum(sdir * q, axis=-1) * inv[:, None, None, :]
        t = jnp.sum(soup.e2[:, None, None, :, :] * q, axis=-1) * inv[:, None, None, :]
        eps = (SHADOW_EPS * (1.0 + t_chunk))[..., None]
        ok = (
            (u >= -_EPS_BARY)
            & (v >= -_EPS_BARY)
            & (u + v <= 1.0 + _EPS_BARY)
            & (t > eps)
            & tri_ok[:, None, None, :]
        )
        return None, jnp.any(ok, axis=-1)  # [W, C, ch]

    _, occ = jax.lax.scan(scan_body, None, (xs_p, xs_t))
    occ = occ.transpose(1, 2, 0, 3).reshape(W, C, p_pad)
    return occ[:, :, :P]


def compute_lit(soup: TriangleSoup, scene, points, t_hit) -> jnp.ndarray:
    """Per-light visibility [W, C, P, L] from primary hit points — one
    shadow_occlusion pass per light. Shared by every shadowed render path
    (jnp raytrace/rasterize and the Pallas planar epilogue) so the
    normalization expression stays in one place (it must match the
    kernel's camera-row packing bit-for-bit)."""
    cols = []
    for li in range(int(scene.light_dir.shape[0])):
        sdir = -(
            scene.light_dir[li]
            / jnp.maximum(jnp.linalg.norm(scene.light_dir[li]), 1e-20)
        )
        occ = shadow_occlusion(soup, points, sdir, t_hit)
        cols.append(jnp.where(occ, 0.0, 1.0))
    return jnp.stack(cols, axis=-1)


def finish_frames(
    soup: TriangleSoup,
    state: SimState,
    scene: SceneData,
    dirs: jnp.ndarray,  # f32 [W, C, P, 3]
    idx: jnp.ndarray,  # i32 [W, C, P]
    hit: jnp.ndarray,  # bool [W, C, P]
    depth_values: jnp.ndarray,  # f32 [W, C, P] (t or z, per mode)
    *,
    height: int,
    width: int,
    texture_filter: str = "nearest",
    with_segmask: bool = True,
    lit=None,  # f32 [W, C, P, L] per-light visibility (shadows), or None
    mip_t=None,  # f32 [W, C, P] hit distances (mip level input); required
    #             when the scene carries mip chains (tex_mip L > 1)
    mip_fov=None,  # f32 [W, C] effective fov degrees (mip level input)
    mip_hit=None,  # bool [W, C, P] geometric-hit mask for the tile clamp
    #               (pre far-clip / camera masking); defaults to `hit`
) -> Frames:
    """Shared shading epilogue: gather the best triangle per pixel,
    recompute barycentrics, interpolate attributes, shade, pack Frames.
    Used by every render path (jnp/Pallas × raytrace/raster)."""
    W, C = state.camera_pos.shape[:2]
    bv0 = _gather_soup(soup.v0, idx)
    be1 = _gather_soup(soup.e1, idx)
    be2 = _gather_soup(soup.e2, idx)
    o = state.camera_pos[:, :, None, :]
    _, u, v, _ = _moller_trumbore(o, dirs, bv0, be1, be2)
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)

    uv = (
        _gather_soup(soup.uv0, idx)
        + u[..., None] * _gather_soup(soup.duv1, idx)
        + v[..., None] * _gather_soup(soup.duv2, idx)
    )
    normal = (
        _gather_soup(soup.n0, idx)
        + u[..., None] * _gather_soup(soup.dn1, idx)
        + v[..., None] * _gather_soup(soup.dn2, idx)
    )
    mat = _gather_soup(soup.mat, idx)

    tex_override = None
    if (
        texture_filter == "trilinear"
        and int(scene.tex_mip_offset.shape[1]) == 1
        and int(scene.tex_data.shape[0]) > 1
    ):
        raise ValueError(
            "trilinear filtering needs mip chains — bake the scene with "
            "mipmaps=True (ManagerConfig.mipmaps)"
        )
    if int(scene.tex_mip_offset.shape[1]) > 1:
        # Mip-aware sampling with the paged path's tile-adaptive clamp
        # (ops/mips.py defines the semantics; the Pallas kernel matches).
        from . import mips

        tan_y = jnp.tan(jnp.deg2rad(mip_fov) * 0.5)
        density = _gather_soup(soup.density, idx)
        L = int(scene.tex_mip_offset.shape[1])
        lvl = mips.mip_level(mip_t, tan_y[:, :, None], height, density, L)
        tex_id = scene.mat_tex[mat]
        tile_sub, tiles_x, n_tiles = mips.tile_geometry(height, width)
        tid = mips.tile_ids(height, width, tile_sub, tiles_x)
        geo_hit = hit if mip_hit is None else mip_hit
        clamp_blend = None
        if texture_filter == "trilinear":
            clamp_blend = mips.mip_blend_weight(
                mip_t, tan_y[:, :, None], height, density, lvl
            )
        lvl, kill_blend = mips.clamp_levels(
            scene, tex_id, uv, lvl, geo_hit, tid, n_tiles, texture_filter,
            tile_clamp_blend=clamp_blend,
        )
        blend = None
        if texture_filter == "trilinear":
            blend = mips.mip_blend_weight(
                mip_t, tan_y[:, :, None], height, density, lvl
            )
            blend = jnp.where(kill_blend, 0.0, blend)
        tex_override = mips.sample_texture_mip(
            scene, tex_id, uv, lvl, texture_filter, blend=blend
        )

    cam_ok = state.camera_valid[:, :, None] > 0.0
    hit = hit & cam_ok

    rgb = shade_lambert(
        scene, mat, uv, normal, dirs, hit, texture_filter, lit=lit,
        tex_override=tex_override,
    )
    depth = jnp.where(hit, depth_values, 0.0)
    if with_segmask:
        seg = _gather_soup(soup.seg, idx)
        segmask = jnp.where(hit, seg, -1)
    else:
        segmask = jnp.full_like(idx, -1)

    return Frames(
        rgb=rgb.reshape(W, C, height, width, 4),
        depth=depth.reshape(W, C, height, width),
        segmask=segmask.reshape(W, C, height, width),
    )


def _gather_soup(soup_field: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-pixel best-triangle data. soup_field [W, S, ...],
    idx [W, C, P] → [W, C, P, ...]."""
    W, C, P = idx.shape
    flat = idx.reshape(W, C * P)
    out = jnp.take_along_axis(
        soup_field,
        flat.reshape(W, C * P, *([1] * (soup_field.ndim - 2))),
        axis=1,
    )
    return out.reshape(W, C, P, *soup_field.shape[2:])


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "fov_y_degrees", "chunk", "texture_filter", "shadows",
        "watertight",
    ),
)
@f32_precise
def _raytrace_jit(
    state: SimState,
    scene: SceneData,
    *,
    height: int,
    width: int,
    near: float = 0.1,
    far: float = 1000.0,
    fov_y_degrees: float = 90.0,
    chunk: int = 16,
    texture_filter: str = "nearest",
    shadows: bool = False,
    watertight: bool = False,
) -> Frames:
    soup = build_world_soup(state, scene)
    eff_fov = jnp.where(state.camera_fov > 0, state.camera_fov, fov_y_degrees)
    eff_near = jnp.where(state.camera_znear > 0, state.camera_znear, near)
    dirs = camera_ray_dirs(state.camera_rot, height, width, eff_fov)
    if watertight:
        from .watertight import intersect_watertight as _intersect
    else:
        _intersect = intersect_bruteforce
    t, idx, hit = _intersect(
        soup, state.camera_pos, dirs, eff_near, jnp.full_like(eff_near, far),
        chunk=chunk,
    )
    lit = None
    if shadows:
        points = state.camera_pos[:, :, None, :] + t[..., None] * dirs
        lit = compute_lit(soup, scene, points, t)
    return finish_frames(
        soup, state, scene, dirs, idx, hit, t,
        height=height, width=width, texture_filter=texture_filter, lit=lit,
        mip_t=t, mip_fov=eff_fov,
    )


def raytrace(
    state: SimState,
    scene: SceneData,
    *,
    watertight: bool | None = None,
    **kw,
) -> Frames:
    """Render every (world, camera) view. Returns padded Frames
    [W, C, H, Wd, ...]; invalid camera slots render black/0/-1.
    ``shadows=True`` traces one any-hit shadow ray per (pixel, light) —
    a beyond-reference feature (the reference's lambert is unshadowed).
    ``watertight=True`` (default: env MRT_WATERTIGHT=1) swaps in the
    Woop et al. sheared-edge-function intersector (ops/watertight.py) —
    crack-free seams instead of ε-slack edges; jnp path only.

    Thin unjitted wrapper: ``watertight`` (including its env default)
    must resolve BEFORE the jit boundary — it is a static argname, so
    the compiled-trace cache keys on the resolved bool and toggling
    MRT_WATERTIGHT between calls re-traces instead of silently reusing
    the other variant's cache.
    """
    if watertight is None:
        import os

        watertight = os.environ.get("MRT_WATERTIGHT", "0") == "1"
    return _raytrace_jit(state, scene, watertight=bool(watertight), **kw)
