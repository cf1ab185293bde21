"""Mip-mapping + paged-texture shared math (jnp reference semantics).

The reference samples BC7 textures of any size through hardware samplers
with mip chains (``render_mgr->loadObjects`` textures, reference
``src/mgr.cpp:352-354``). The TPU equivalent baked here (round 3):

  * ``core/scene.bake_scene(mipmaps=...)`` builds a box-filtered mip
    chain per texture and lays the texel pool out as
    ``[fallback region | fine levels]`` — the fallback region holds every
    texture's *coarse* chain (levels ≥ ``tex_fit_level``) and is small
    enough to stay resident in kernel VMEM.
  * Per-pixel mip level = ⌊log₂(footprint)⌋ where footprint =
    ``t · (2·tan_y / height) · texel_density`` (texels per world unit at
    the base level, a per-triangle quantity carried by the soup). The
    level is computed by power-of-two *comparisons* (exact in f32), so
    the jnp reference and the Mosaic kernel agree bit-for-bit.
  * The paged kernel DMAs, per pixel tile, one ``PAGE_ROWS``-row window
    of the fine pool, anchored at the tile's magnified (level-0) pixels
    when any exist (window_base). Pixels whose taps fall outside the
    window fall back to their material's coarse chain — the per-pixel
    window clamp (clamp_levels): a wrapped-uv surface degrades only
    itself, never a sharp close-up sharing the tile. The helpers here
    reproduce that decision exactly so the jnp reference path defines
    the semantics the kernel must match.

All functions are pure jnp and run on CPU (tests) and TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scene import TEX_FB_ROWS as FB_ROWS
from ..core.scene import TEX_PAGE_ROWS as PAGE_ROWS

TILE_LANE = 128
TILE_SUB_MIN = 8
TILE_SUB_MAX = 32


def pick_tile_sub(n_pixels: int) -> int:
    """Largest power-of-two sublane count ≤ 32 the image actually fills
    (small images keep small tiles so padding lanes aren't swept). The
    single source for the kernel's pixel-tile height — ref-path mip
    clamping must agree with the kernel's tiling exactly.
    MRT_TILE_SUB_MAX is a measurement knob for the tools/ benches."""
    import os

    cap = int(os.environ.get("MRT_TILE_SUB_MAX", str(TILE_SUB_MAX)))
    need = -(-n_pixels // TILE_LANE)
    sub = TILE_SUB_MIN
    while sub < cap and sub < need:
        sub *= 2
    return sub


def tile_geometry(height: int, width: int):
    """(tile_sub, tiles_x, n_tiles) for the scalar kernel's tiling: 2D
    (tile_sub × 128) rectangles when the image is wide enough, else
    flattened-index bands. Mirrored by render_core for the culled and
    paged-texture paths."""
    P = height * width
    tile_sub = pick_tile_sub(P)
    tiles_x = 1
    if (
        width % TILE_LANE == 0
        and width // TILE_LANE >= 2
        and height >= tile_sub
    ):
        tiles_x = width // TILE_LANE
    if tiles_x > 1:
        n_tiles = tiles_x * (-(-height // tile_sub))
    else:
        n_tiles = -(-P // (tile_sub * TILE_LANE))
    return tile_sub, tiles_x, n_tiles


def mip_level(t, tan_y, height: int, density, num_levels: int):
    """Per-pixel mip level ∈ [0, num_levels).

    footprint = t · (2·tan_y/height) · density  (texels per pixel-ish);
    level = ⌊log₂(footprint)⌋ computed as Σ_l [footprint ≥ 2^l] — exact
    f32 comparisons, no transcendentals, so the kernel twin (same sum of
    compares) matches bit-for-bit. footprint ≤ 1 (magnified) → level 0.
    """
    fp = t * (2.0 / height) * tan_y * density
    lvl = jnp.zeros(fp.shape, jnp.int32)
    for l in range(1, num_levels):
        lvl = lvl + (fp >= jnp.float32(2.0**l)).astype(jnp.int32)
    return lvl


def level_boundary_mask(t, tan_y, height: int, density, num_levels: int,
                        rel: float = 1e-4):
    """Pixels whose footprint sits within `rel` of a 2^l level boundary.

    The kernel's hit distance differs from the jnp reference's by f32
    ulps (different-but-equivalent Möller–Trumbore factorizations), so
    the selected level at an *exact* power-of-two footprint is ambiguous
    by design — the same way hardware LOD selection is approximate.
    Parity tests exempt these pixels (and only these) from the ±1 LSB
    contract."""
    fp = t * (2.0 / height) * tan_y * density
    near = jnp.zeros(fp.shape, bool)
    for l in range(1, num_levels):
        b = jnp.float32(2.0**l)
        near = near | (jnp.abs(fp - b) <= rel * b)
    return near


def mip_blend_weight(t, tan_y, height: int, density, level):
    """Trilinear blend weight w ∈ [0, 1] between `level` and `level+1`:
    w = clamp(footprint / 2^level − 1, 0, 1) — a linear proxy for
    frac(log₂ footprint) that is 0 at each level boundary and 1 at the
    next, so the blend is continuous across levels. All operations are
    exact given fp (power-of-two divide; Sterbenz subtraction in [1, 2)),
    so the kernel twin agrees to the bit for equal fp."""
    fp = t * (2.0 / height) * tan_y * density
    pw = jnp.exp2(level.astype(jnp.float32))
    return jnp.clip(fp / pw - 1.0, 0.0, 1.0)


def soup_texel_density(e1w, e2w, duv1, duv2, base_w, base_h):
    """Texels-per-world-unit at the base mip, per (world-space) triangle:
    sqrt(uv_area · w·h / world_area). Exact under instance transforms
    because it uses the *world* edges. Degenerate triangles → 0."""
    cw = jnp.cross(e1w, e2w)
    a_world = jnp.sqrt(jnp.sum(cw * cw, axis=-1))
    a_uv = jnp.abs(
        duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    )
    tex_area = a_uv * base_w.astype(jnp.float32) * base_h.astype(jnp.float32)
    return jnp.sqrt(tex_area / jnp.maximum(a_world, 1e-30))


def tile_ids(height: int, width: int, tile_sub: int, tiles_x: int):
    """i32 [H·W]: which kernel tile owns each pixel — flattened-index
    bands when tiles_x == 1, 2D (tile_sub × 128) rectangles otherwise.
    Must mirror the kernel's program-id decomposition exactly."""
    y = jnp.arange(height, dtype=jnp.int32)[:, None]
    x = jnp.arange(width, dtype=jnp.int32)[None, :]
    if tiles_x > 1:
        tid = (y // tile_sub) * tiles_x + x // TILE_LANE
    else:
        p = y * width + x
        tid = p // (tile_sub * TILE_LANE)
    return jnp.broadcast_to(tid, (height, width)).reshape(-1)


def _segment_min(vals, tid, n_tiles: int, fill):
    """Per-tile min of vals [..., P] grouped by tid [P], broadcast back
    per pixel (scatter-min via .at — host/XLA path only, never in the
    kernel; the kernel computes its own tile's scalar reduce)."""
    batch = vals.shape[:-1]
    v2 = vals.reshape((-1, vals.shape[-1]))
    acc = jnp.full((v2.shape[0], n_tiles), fill, vals.dtype)
    bidx = jnp.broadcast_to(
        jnp.arange(v2.shape[0], dtype=jnp.int32)[:, None], v2.shape
    )
    tidb = jnp.broadcast_to(tid[None, :], v2.shape)
    acc = acc.at[bidx, tidb].min(v2)
    return acc[bidx, tidb].reshape(batch + (vals.shape[-1],))


def window_base(row_lo, row_hi, fine, level, tid, n_tiles: int):
    """Per-pixel (broadcast per tile) 8-aligned base row of the tile's
    fine-pool DMA window. The window anchors at the tile's *magnified*
    pixels (level 0) when any exist — coarse fallback hurts those most —
    else at the lowest fine row. Pixels whose own tap span can never fit
    one window (uv-seam wraps touching both texture edges) are excluded
    from anchoring: one seam pixel must not drag the window away from
    every interior pixel (they clamp coarse themselves instead). Tiles
    with no fine pixels get base 0. The kernel computes the identical
    scalar reduce for its own tile."""
    big = jnp.int32(1 << 30)
    fits_self = (row_hi - row_lo) < PAGE_ROWS
    anchor_ok = fine & fits_self
    pref = _segment_min(
        jnp.where(anchor_ok & (level == 0), row_lo, big), tid, n_tiles, big
    )
    anyf = _segment_min(
        jnp.where(anchor_ok, row_lo, big), tid, n_tiles, big
    )
    r0 = jnp.where(pref < big, pref, anyf)
    r0 = jnp.where(r0 < big, r0, 0)
    return (r0 // 8) * 8


def sample_texture_mip(scene, tex_id, uv, level, texture_filter: str,
                       blend=None):
    """Mip-aware sample from the flat texel pool → f32 [..., 4].

    Same wrap/center conventions as shade.sample_texture_* but at the
    per-pixel level's offset/size (tex_mip_offset/w/h [K, L]).
    "trilinear" = bilinear at `level` and `level+1` (clamped), lerped by
    `blend` (mip_blend_weight) — what the reference's hardware samplers
    do by default."""
    K, L = scene.tex_mip_offset.shape
    if texture_filter == "trilinear":
        lo = sample_texture_mip(scene, tex_id, uv, level, "bilinear")
        hi = sample_texture_mip(
            scene, tex_id, uv, jnp.minimum(level + 1, L - 1), "bilinear"
        )
        b = blend[..., None]
        return lo * (1.0 - b) + hi * b
    lin = tex_id * L + jnp.clip(level, 0, L - 1)
    w = scene.tex_mip_w.reshape(-1)[lin]
    h = scene.tex_mip_h.reshape(-1)[lin]
    off = scene.tex_mip_offset.reshape(-1)[lin]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    if texture_filter == "bilinear":
        wf = w.astype(jnp.float32)
        hf = h.astype(jnp.float32)
        fx = u * wf - 0.5
        fy = (1.0 - v) * hf - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = (fx - x0)[..., None]
        ay = (fy - y0)[..., None]

        def texel(xi, yi):
            xm = jnp.mod(xi.astype(jnp.int32), w)
            ym = jnp.mod(yi.astype(jnp.int32), h)
            return scene.tex_data[off + ym * w + xm]

        t00 = texel(x0, y0)
        t10 = texel(x0 + 1, y0)
        t01 = texel(x0, y0 + 1)
        t11 = texel(x0 + 1, y0 + 1)
        top = t00 * (1 - ax) + t10 * ax
        bot = t01 * (1 - ax) + t11 * ax
        return top * (1 - ay) + bot * ay
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(((1.0 - v) * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    return scene.tex_data[off + y * w + x]


def mip_tap_rows(scene, tex_id, uv, level, texture_filter: str):
    """(row_lo, row_hi) i32 [...]: min/max 128-texel pool row touched by
    the pixel's tap(s) at `level` — the window inputs for the per-pixel
    clamp. Must mirror the kernel's tap math exactly. Trilinear callers
    pass "bilinear" per blended level: the two levels' spans are
    hundreds of rows apart in the pool, so the clamp treats them
    separately (see clamp_levels' three-tier degradation) rather than
    as one unfittable union."""
    K, L = scene.tex_mip_offset.shape
    lin = tex_id * L + jnp.clip(level, 0, L - 1)
    w = scene.tex_mip_w.reshape(-1)[lin]
    h = scene.tex_mip_h.reshape(-1)[lin]
    off = scene.tex_mip_offset.reshape(-1)[lin]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    if texture_filter == "bilinear":
        wf = w.astype(jnp.float32)
        hf = h.astype(jnp.float32)
        fx = u * wf - 0.5
        fy = (1.0 - v) * hf - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        flats = []
        for dx in (0, 1):
            for dy in (0, 1):
                xm = jnp.mod(x0 + dx, w)
                ym = jnp.mod(y0 + dy, h)
                flats.append(off + ym * w + xm)
        rows = [f // TILE_LANE for f in flats]
        lo = rows[0]
        hi = rows[0]
        for r in rows[1:]:
            lo = jnp.minimum(lo, r)
            hi = jnp.maximum(hi, r)
        return lo, hi
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(((1.0 - v) * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    row = (off + y * w + x) // TILE_LANE
    return row, row


def clamp_levels(
    scene, tex_id, uv, level, hit, tid, n_tiles: int,
    texture_filter: str,
    tile_clamp_blend=None,  # required for trilinear: mip_blend_weight at
    #                         the UNCLAMPED level (window-row inputs)
):
    """Filter-aware per-pixel window clamp with three-tier degradation.

    Each tile gets ONE fine-pool DMA window (PAGE_ROWS rows, base from
    window_base, anchored on the *primary*-level spans). Per pixel:

      1. primary taps in window           → sample as requested;
      2. primary in window but trilinear
         secondary taps out of window     → degrade to bilinear at the
                                            primary level (kill the
                                            blend — sharp beats a jump
                                            to the coarse chain);
      3. primary taps out of window       → fall back to the material's
                                            coarse (resident) chain.

    Returns (clamped_level, kill_blend) — kill_blend is None for
    non-trilinear filters, else a bool mask the caller must apply as
    blend = where(kill, 0, blend). Per-pixel — a wrapped-uv floor no
    longer drags a sharp close-up in the same tile down to coarse mips,
    and a trilinear pixel whose two levels straddle the window keeps
    its sharp level instead of evicting to the fallback."""
    prim_filter = "bilinear" if texture_filter == "trilinear" else texture_filter
    # Per-scene resident-fallback boundary (bake-time auto-sized static
    # field; default-constructed scenes fall back to the module constant).
    fb = int(getattr(scene, "fb_rows", FB_ROWS))
    plo, phi = mip_tap_rows(scene, tex_id, uv, level, prim_filter)
    fine = hit & (phi >= fb)
    base = window_base(plo, phi, fine, level, tid, n_tiles)
    prim_in = (plo >= base) & (phi < base + PAGE_ROWS)
    fit = scene.tex_fit_level[tex_id]
    out = jnp.where(fine & ~prim_in, jnp.maximum(level, fit), level)
    kill = None
    if texture_filter == "trilinear":
        K, L = scene.tex_mip_offset.shape
        slo, shi = mip_tap_rows(
            scene, tex_id, uv, jnp.minimum(level + 1, L - 1), "bilinear"
        )
        live = tile_clamp_blend > 0.0
        sec_ok = (
            (~live)
            | (shi < fb)  # secondary level resident → always there
            | ((slo >= base) & (shi < base + PAGE_ROWS))
        )
        kill = fine & prim_in & ~sec_ok
    return out, kill
