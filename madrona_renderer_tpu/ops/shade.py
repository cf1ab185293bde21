"""Shared shading math: hit attributes → RGBA8 pixels.

One directional lambert light plus a constant ambient term, matching the
lighting model the reference configures (a single directional light with
direction and color — ``configureLighting`` usage, reference
``src/mgr.cpp:356-359``). The exact shader constants of the engine's
(absent) kernels are unobservable; ours are documented here:

  * ``AMBIENT = 0.2`` constant ambient.
  * Two-sided shading: the surface normal is flipped toward the viewer
    (no backface culling in the intersector, so both faces shade alike).
  * Nearest-neighbor texture sampling, repeat wrap, OBJ UV convention
    (v=0 at the bottom of the image).
  * Misses produce RGBA (0, 0, 0, 255), depth 0.0, segmask -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.scene import SceneData

AMBIENT = 0.2


def sample_texture_nearest(scene: SceneData, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample from the flat texel pool.

    tex_id: i32 [...], uv: f32 [..., 2] → f32 [..., 4].
    """
    w = scene.tex_width[tex_id]
    h = scene.tex_height[tex_id]
    off = scene.tex_offset[tex_id]
    u = uv[..., 0] - jnp.floor(uv[..., 0])  # repeat wrap
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    # OBJ/GL convention: v grows upward; texel row 0 is the image top.
    x = jnp.clip((u * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(((1.0 - v) * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    flat = off + y * w + x
    return scene.tex_data[flat]


def sample_texture_bilinear(scene: SceneData, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (repeat wrap), texel centers at half-integers —
    matches GPU linear samplers (the reference's Vulkan/CUDA texture units
    filter linearly). 4 gathers + lerp."""
    wf = scene.tex_width[tex_id].astype(jnp.float32)
    hf = scene.tex_height[tex_id].astype(jnp.float32)
    w = scene.tex_width[tex_id]
    h = scene.tex_height[tex_id]
    off = scene.tex_offset[tex_id]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    fx = u * wf - 0.5
    fy = (1.0 - v) * hf - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]

    def texel(xi, yi):
        # repeat wrap via floored modulo
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


def shade_lambert_planar(
    scene: SceneData,
    mat_id: jnp.ndarray,  # i32 [...]
    u: jnp.ndarray,  # f32 [...] texture u
    v: jnp.ndarray,  # f32 [...] texture v
    nx: jnp.ndarray,  # f32 [...] normal components (pre-flipped)
    ny: jnp.ndarray,
    nz: jnp.ndarray,
    hit_mask: jnp.ndarray,  # bool [...]
    texture_filter: str = "nearest",
    lit=None,  # f32 [..., L] per-light visibility (shadows), or None
) -> jnp.ndarray:
    """Planar shading → packed RGBA as u32 [...].

    Everything stays in planar (no trailing small dims): on TPU a
    materialized ``f32[..., 4]`` tile-pads its minor dim 4 → 128 lanes
    (32× memory) — measured as an OOM at 16k worlds. The packed u32 result
    bitcasts to the final ``u8 [..., 4]`` image at the very end.
    """
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    # Per-light clamped lambert terms, summed per channel below (L = 1
    # reduces bit-exactly to the single-light formula: 0 + x == x).
    n_lights = int(scene.light_dir.shape[0])
    ndotls = []
    for li in range(n_lights):
        lx, ly, lz = (
            scene.light_dir[li, 0], scene.light_dir[li, 1], scene.light_dir[li, 2],
        )
        l_inv = jax.lax.rsqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-20))
        nd = -(nx * lx + ny * ly + nz * lz) * (inv_len * l_inv)
        nd = jnp.maximum(0.0, nd)
        if lit is not None:
            nd = nd * lit[..., li]
        ndotls.append(nd)

    m = scene.mat_color.shape[0]
    onehot = jax.nn.one_hot(mat_id, m, dtype=jnp.float32)  # [..., M]
    base_r = onehot @ scene.mat_color[:, 0]
    base_g = onehot @ scene.mat_color[:, 1]
    base_b = onehot @ scene.mat_color[:, 2]

    if int(scene.tex_data.shape[0]) > 1:
        tex_id = jnp.round(onehot @ scene.mat_tex.astype(jnp.float32)).astype(jnp.int32)
        w = scene.tex_width[tex_id]
        h = scene.tex_height[tex_id]
        off = scene.tex_offset[tex_id]
        uu = u - jnp.floor(u)
        vv = v - jnp.floor(v)
        if texture_filter == "bilinear":
            wf = w.astype(jnp.float32)
            hf = h.astype(jnp.float32)
            fx = uu * wf - 0.5
            fy = (1.0 - vv) * hf - 0.5
            x0f = jnp.floor(fx)
            y0f = jnp.floor(fy)
            ax = fx - x0f
            ay = fy - y0f

            def texel_ch(xi, yi, ch):
                xm = jnp.mod(xi.astype(jnp.int32), w)
                ym = jnp.mod(yi.astype(jnp.int32), h)
                return scene.tex_data[:, ch][off + ym * w + xm]

            def lerp_ch(ch):
                t00 = texel_ch(x0f, y0f, ch)
                t10 = texel_ch(x0f + 1, y0f, ch)
                t01 = texel_ch(x0f, y0f + 1, ch)
                t11 = texel_ch(x0f + 1, y0f + 1, ch)
                top = t00 * (1 - ax) + t10 * ax
                bot = t01 * (1 - ax) + t11 * ax
                return top * (1 - ay) + bot * ay

            base_r = base_r * lerp_ch(0)
            base_g = base_g * lerp_ch(1)
            base_b = base_b * lerp_ch(2)
        else:
            x = jnp.clip((uu * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
            y = jnp.clip(((1.0 - vv) * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
            flat = off + y * w + x
            base_r = base_r * scene.tex_data[:, 0][flat]
            base_g = base_g * scene.tex_data[:, 1][flat]
            base_b = base_b * scene.tex_data[:, 2][flat]

    def channel(base, ch):
        s = jnp.float32(0.0)
        for li in range(n_lights):
            s = s + ndotls[li] * scene.light_color[li, ch]
        intensity = AMBIENT + (1.0 - AMBIENT) * s
        c = jnp.clip(base * intensity, 0.0, 1.0)
        c = jnp.where(hit_mask, c, 0.0)
        return (c * 255.0 + 0.5).astype(jnp.uint32)

    r8 = channel(base_r, 0)
    g8 = channel(base_g, 1)
    b8 = channel(base_b, 2)
    return r8 | (g8 << 8) | (b8 << 16) | jnp.uint32(255 << 24)


def packed_to_rgba8(packed: jnp.ndarray) -> jnp.ndarray:
    """u32 [...] → u8 [..., 4] (little-endian byte order = RGBA)."""
    return jax.lax.bitcast_convert_type(packed, jnp.uint8)


def shade_lambert(
    scene: SceneData,
    mat_id: jnp.ndarray,  # i32 [...]
    uv: jnp.ndarray,  # f32 [..., 2]
    normal: jnp.ndarray,  # f32 [..., 3] (unnormalized ok)
    view_dir: jnp.ndarray,  # f32 [..., 3] ray direction (unit, towards surface)
    hit_mask: jnp.ndarray,  # bool [...]
    texture_filter: str = "nearest",
    lit=None,  # f32 [..., L] per-light visibility (1 = lit, 0 = shadowed)
    tex_override=None,  # f32 [..., 4] pre-sampled texel (mip path), or None
) -> jnp.ndarray:
    """Returns u8 RGBA [..., 4]."""
    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20
    )
    # Two-sided: flip toward viewer.
    facing = jnp.sign(-jnp.sum(n * view_dir, axis=-1, keepdims=True))
    facing = jnp.where(facing == 0, 1.0, facing)
    n = n * facing

    s = jnp.float32(0.0)
    for li in range(int(scene.light_dir.shape[0])):
        light_dir = scene.light_dir[li] / jnp.maximum(
            jnp.linalg.norm(scene.light_dir[li]), 1e-20
        )
        ndotl = jnp.maximum(0.0, -jnp.sum(n * light_dir, axis=-1, keepdims=True))
        if lit is not None:
            ndotl = ndotl * lit[..., li : li + 1]
        s = s + ndotl * scene.light_color[li]
    intensity = AMBIENT + (1.0 - AMBIENT) * s

    base = scene.mat_color[mat_id]  # [..., 4]
    if tex_override is not None:
        tex = tex_override
    else:
        sampler = (
            sample_texture_bilinear if texture_filter == "bilinear" else sample_texture_nearest
        )
        tex = sampler(scene, scene.mat_tex[mat_id], uv)
    albedo = base * tex

    rgb = jnp.clip(albedo[..., :3] * intensity, 0.0, 1.0)
    rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
    rgba = jnp.where(hit_mask[..., None], rgba, jnp.zeros_like(rgba))
    # Alpha stays 255 everywhere (background included), matching a cleared
    # RGBA8 target.
    rgba = rgba.at[..., 3].set(1.0)
    return (rgba * 255.0 + 0.5).astype(jnp.uint8)
