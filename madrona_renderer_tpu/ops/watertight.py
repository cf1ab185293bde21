"""Watertight ray/triangle intersection (Woop, Benthin & Wald 2013,
JCGT, "Watertight Ray/Triangle Intersection") — the quality-tier
intersector for the jnp semantics path.

The default intersector (`raytrace_ref.intersect_bruteforce`) is
Möller–Trumbore with ε-slack barycentric bounds: seams between adjacent
triangles are over-covered by ε, which avoids cracks in practice but is
a tuned tolerance, not a guarantee. This module implements the Woop
scheme instead: each ray is sheared into a frame where its direction is
+Z and hits are decided by three 2D edge functions. For an edge shared
by two triangles, both edge functions are computed from the *same two
sheared vertex coordinates* with operands swapped, so IEEE arithmetic
makes them exactly negated: one triangle accepts whenever the other
strictly rejects, and exact zeros (ray through the edge) are accepted
by both. No crack can open between triangles whose shared vertices are
bitwise equal.

Divergences from the paper (deliberate, documented):
  * Double-sided: the renderer ignores winding (reference raytracer
    semantics, `src/mgr.cpp` min-t + instance id per pixel), so the
    accept test is "all edge functions ≥ 0 or all ≤ 0" and the paper's
    winding-preserving kx/ky swap is unnecessary (a fixed cyclic axis
    order per ray keeps shared-edge cancellation intact).
  * No double-precision fallback on exact edge-function zeros — TPUs
    have no f64. Zeros are accepted as boundary hits by both adjacent
    triangles, which preserves the no-crack property; it only affects
    which of two coincident boundary hits wins the min-t argmin.

Compiled-mode caveat (measured, r4): the no-crack guarantee relies on
the two shared-edge 2D cross products being computed with identical
roundings so IEEE subtraction negates them exactly. XLA:CPU's backend
may contract ``a*b - c*d`` into an FMA inside compiled code (the
``lax.scan`` body below always compiles), which rounds the two
triangles' copies differently and can flip an exactly-zero edge
function to ±1 ulp — a knife-edge ray can then miss BOTH triangles (a
1-ulp pinhole). Verified: the same edge function reads 0.0 eagerly and
-2e-8 under ``jax.jit`` on CPU. TPU vector code keeps mul and sub as
separate ops, so the guarantee holds on the hardware this framework
targets; the Pallas watertight kernel (raytrace_pallas.py
``watertight=True``) is the production path and its interpret mode is
eager, hence exact.

Depth-parity caveat (measured, r4 — tools/tpu_wt_depth_diag.py): the
stored Woop ``t`` of the SAME winner rounds differently between this
module (XLA codegen: einsum-selected shear coordinates, contractable)
and the Pallas kernel's per-pixel select form (Mosaic: no contraction)
— ~40% of hit pixels differ by 1-8 ulp with a cancellation tail of
<= ~6e-4 relative near silhouettes, with near-identical histograms on
TPU and CPU (codegen-structural, not one backend's divide: rewriting
every divide as 1/x-then-multiply changed nothing). Winner identity,
rgb, and the no-crack DECISION stay bitwise; the on-chip parity bar
for watertight depth is rel <= 1e-3
(tools/tpu_parity_check.py::wt_depth_ok), unlike the default
intersector's bitwise depth bar.

Scope caveat (why this is opt-in, not the default): the scene pipeline
stores triangles in (v0, e1, e2) edge form from bake time onward, so a
vertex shared between triangles is reconstructed as ``v0 + e1`` with up
to 1-ulp disagreement between the triangles. `intersect_watertight`
(the soup-level wrapper) therefore guarantees watertightness only up to
that reconstruction ulp; `woop_intersect` on explicit vertex arrays is
exactly watertight. Making the default path vertex-exact would mean
carrying indexed vertices through bake → transform → kernel, which the
TPU kernels' edge-form prep (pack-time D/A/Q rows) is built around.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shear_frame(dirs: jnp.ndarray):
    """Per-ray shear constants. dirs [..., 3] → (ox, oy, oz one-hots
    [..., 3], Sx, Sy, Sz [...]). kz = argmax |d|; kx, ky cyclic."""
    ad = jnp.abs(dirs)
    kz = jnp.argmax(ad, axis=-1)
    oz = jax.nn.one_hot(kz, 3, dtype=dirs.dtype)
    ox = jnp.roll(oz, 1, axis=-1)  # kx = (kz + 1) % 3
    oy = jnp.roll(oz, 2, axis=-1)  # ky = (kz + 2) % 3
    dz = jnp.sum(dirs * oz, axis=-1)
    dx = jnp.sum(dirs * ox, axis=-1)
    dy = jnp.sum(dirs * oy, axis=-1)
    # |dz| is the max-magnitude component of a nonzero direction.
    # Reciprocal-multiply form, NOT dx / dz: Mosaic lowers a general
    # f32 a/b differently from XLA:TPU (the dequant-LUT misround
    # gotcha), but both backends produce bit-identical 1.0/x — the
    # non-watertight sweep's bitwise on-chip parity rides exactly that
    # (inv = 1/det, t = t_num * inv). Keeping every watertight divide
    # in 1/x-then-multiply form keeps the Pallas kernel's depth bitwise
    # against this reference on hardware (r4 chainE: the a/b form read
    # ~5% of depth pixels 1-3 ulp off, same winners).
    sz = 1.0 / dz
    sx = dx * sz
    sy = dy * sz
    return ox, oy, oz, sx, sy, sz


def _edge_function_hit(ax, ay, az, bx, by, bz, cx, cy, cz):
    """Shared core of both intersectors: 2D edge functions over sheared
    coordinates → (u, v, w, det, t, accept). Shape-polymorphic (works on
    the [R, S] all-pairs layout and the [W, C, S, p] chunked layout).
    Double-sided accept; zeros (ray exactly through an edge) accepted."""
    u = cx * by - cy * bx  # weight of v0
    v = ax * cy - ay * cx  # weight of v1
    w = bx * ay - by * ax  # weight of v2
    det = u + v + w
    # Reciprocal-multiply, not /det — see _shear_frame's rounding note.
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    t = jnp.where(det != 0.0, (u * az + v * bz + w * cz) * inv_det, jnp.inf)
    accept = (det != 0.0) & (
        ((u >= 0.0) & (v >= 0.0) & (w >= 0.0))
        | ((u <= 0.0) & (v <= 0.0) & (w <= 0.0))
    )
    return u, v, w, det, t, accept


def woop_intersect(
    orig: jnp.ndarray,  # f32 [..., 3] (broadcastable to rays)
    dirs: jnp.ndarray,  # f32 [R, 3]
    v0: jnp.ndarray,  # f32 [S, 3]
    v1: jnp.ndarray,
    v2: jnp.ndarray,
):
    """All-pairs watertight test of R rays × S triangles.

    Returns (t [R, S], accept [R, S], bary [R, S, 3]); ``t`` is the hit
    parameter (may be ≤ 0 for hits behind the origin — callers bound it),
    ``bary`` the (v0, v1, v2) weights. Exactly watertight across edges
    whose endpoint coordinates are bitwise shared between triangles.
    """
    ox, oy, oz, sx, sy, sz = _shear_frame(dirs)  # [R, ...]

    def sheared(v):
        # v [S, 3] translated per ray-origin → [R, S] coordinates.
        tv = v[None, :, :] - jnp.asarray(orig)[..., None, :]  # [R, S, 3]
        px = jnp.sum(tv * ox[:, None, :], axis=-1)
        py = jnp.sum(tv * oy[:, None, :], axis=-1)
        pz = jnp.sum(tv * oz[:, None, :], axis=-1)
        return (
            px - sx[:, None] * pz,
            py - sy[:, None] * pz,
            sz[:, None] * pz,
        )

    ax, ay, az = sheared(v0)
    bx, by, bz = sheared(v1)
    cx, cy, cz = sheared(v2)
    u, v, w, det, t, accept = _edge_function_hit(
        ax, ay, az, bx, by, bz, cx, cy, cz
    )
    inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    bary = jnp.stack([u * inv, v * inv, w * inv], axis=-1)
    return t, accept, bary


def intersect_watertight(
    soup,
    orig: jnp.ndarray,  # f32 [W, C, 3]
    dirs: jnp.ndarray,  # f32 [W, C, P, 3]
    near,  # float | f32 [W, C] | f32 [W, C, P]
    far,  # float | f32 [W, C]
    chunk: int = 512,
):
    """Min-t watertight intersection with `intersect_bruteforce`'s exact
    contract: returns (t [W, C, P], idx [W, C, P], hit [W, C, P]).

    Triangles come from the edge-form soup, so v1/v2 are reconstructed
    as ``v0 + e1/e2`` (see module docstring for the ulp caveat). Pixel
    chunking deliberately mirrors `intersect_bruteforce`
    (raytrace_ref.py) line-for-line — pad/near-broadcast/scan/argmin —
    so the two intersectors stay diffable; a change to that scaffolding
    must be applied to both (the per-chunk *test* is what differs).
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

    # Translated vertices per (camera, triangle): [W, C, S, 3].
    a3 = soup.v0[:, None, :, :] - orig[:, :, None, :]
    b3 = a3 + soup.e1[:, None, :, :]
    c3 = a3 + soup.e2[:, None, :, :]
    tri_ok = soup.valid[:, None, :] > 0.0  # [W, 1→C, S]

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
        near_xs = jnp.zeros((n_chunks, 1, 1, 1), jnp.float32)

    def scan_body(_, chunk_xs):
        d_chunk, near_chunk = chunk_xs  # [W, C, p, 3], [W, C, p]
        n_lo = near_chunk[:, :, None, :] if near_per_pixel else near_b
        ox, oy, oz, sx, sy, sz = _shear_frame(d_chunk)  # one-hots [W,C,p,3]

        def sheared(v3):
            # [W, C, S, 3] × per-pixel axes → [W, C, S, p].
            px = jnp.einsum("wcsk,wcpk->wcsp", v3, ox)
            py = jnp.einsum("wcsk,wcpk->wcsp", v3, oy)
            pz = jnp.einsum("wcsk,wcpk->wcsp", v3, oz)
            return (
                px - sx[:, :, None, :] * pz,
                py - sy[:, :, None, :] * pz,
                sz[:, :, None, :] * pz,
            )

        ax, ay, az = sheared(a3)
        bx, by, bz = sheared(b3)
        cx, cy, cz = sheared(c3)
        _u, _v, _w, _det, t, accept = _edge_function_hit(
            ax, ay, az, bx, by, bz, cx, cy, cz
        )
        ok = accept & (t > n_lo) & (t < far_b) & tri_ok[..., None]
        t = jnp.where(ok, t, jnp.inf)
        best_t = jnp.min(t, axis=2)
        best_idx = jnp.argmin(t, axis=2).astype(jnp.int32)
        return None, (best_t, best_idx)

    _, (t_chunks, idx_chunks) = jax.lax.scan(scan_body, None, (xs, near_xs))
    best_t = t_chunks.transpose(1, 2, 0, 3).reshape(W, C, p_pad)[:, :, :P]
    best_idx = idx_chunks.transpose(1, 2, 0, 3).reshape(W, C, p_pad)[:, :, :P]
    hit = jnp.isfinite(best_t)
    return jnp.where(hit, best_t, 0.0), jnp.where(hit, best_idx, 0), hit
