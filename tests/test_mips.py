"""Mip-mapping + paged-texture path (VERDICT r2 items 2 & 3).

Covers: the bake's mip chains and pool layout, the shared level/clamp
math (ops/mips.py), the jnp reference's mip sampling, minification
anti-aliasing evidence, and jnp↔Pallas parity of the paged kernel path
(resident fallback region + per-tile DMA windows) across filters, tile
shapes, the overflow clamp, shadows, raster mode, and the combined
big-mesh + big-texture case.

Parity contract note: the kernel's hit distance/uv differ from the jnp
reference's by f32 ulps (equivalent Möller–Trumbore factorizations), so
*nearest* sampling may land on an adjacent texel at exact texel
boundaries and level selection may flip at exact power-of-two
footprints. Smooth gradient textures bound that inherent ambiguity to
≤2 LSB while still catching every structural bug (wrong offsets, level
math, window or clamp logic produce large errors).
"""

import os
import tempfile

import numpy as np
import pytest

from madrona_renderer_tpu.assets.png import encode_png
from madrona_renderer_tpu.config import (
    AdditionalMaterial, ImportedCamera, ImportedInstance,
)
from madrona_renderer_tpu.core.scene import (
    TEX_FB_ROWS, TEX_RESIDENT_ROWS, _mip_next,
)
from madrona_renderer_tpu.ops import mips
from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as rt_pal
from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_ref

from tests.helpers import build, quad_uvs, quad_xz


def _gradient_png(size=256):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    img = np.stack(
        [xx * 255, yy * 255, (xx + yy) * 127.5, np.full_like(xx, 255)],
        axis=-1,
    ).astype(np.uint8)
    path = os.path.join(tempfile.gettempdir(), f"mrt_mip_grad_{size}.png")
    with open(path, "wb") as f:
        f.write(encode_png(img))
    return path, img


def _checker_png(size=256, cell=4):
    yy, xx = np.mgrid[0:size, 0:size]
    c = ((yy // cell + xx // cell) % 2).astype(np.uint8) * 255
    img = np.stack([c, c, c, np.full_like(c, 255)], axis=-1)
    path = os.path.join(tempfile.gettempdir(), f"mrt_mip_chk_{size}.png")
    with open(path, "wb") as f:
        f.write(encode_png(img))
    return path, img


def _scene(tex_path, uv_scale=7.3, mipmaps="auto", extra_mesh=None,
           n_worlds=1):
    meshes = [quad_xz(half=60.0, y=0.0)]
    uvs = [quad_uvs() * uv_scale]
    mats = [0]
    instances = [
        ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                         scale=[1, 1, 1], object_id=0)
    ]
    if extra_mesh is not None:
        meshes.append(extra_mesh)
        uvs.append(np.zeros((len(extra_mesh), 2), np.float32))
        mats.append(1)
        instances.append(
            ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=1)
        )
    import tests.helpers as H
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.config import WorldInit

    geo = H.geo_from_meshes(meshes, uvs=uvs, materials=mats)
    merged = load_render_assets(
        geo, [],
        [AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0),
         AdditionalMaterial(color=(0.9, 0.4, 0.3, 1.0))],
        [tex_path],
    )
    scene = bake_scene(merged, mipmaps=mipmaps)
    state = init_state(
        instances,
        [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
        [WorldInit(num_instances=len(instances), instance_offset=0,
                   num_cameras=1, camera_offset=0)] * n_worlds,
    )
    return state, scene




def _assert_close_modulo_boundaries(a, b, frac=0.02, hard=64):
    """Parity modulo the inherent nearest-sampling boundary ambiguity:
    at most `frac` of pixels may differ beyond 2 LSB (a texel/level flip
    at an exact boundary), and no pixel beyond `hard` (structural bugs —
    wrong offsets/levels/windows — blow far past it)."""
    d = np.abs(np.asarray(a.rgb, np.int16) - np.asarray(b.rgb, np.int16))
    dm = d.max(axis=-1)
    assert d.max() <= hard, d.max()
    bad = float((dm > 2).mean())
    assert bad <= frac, (bad, d.max())



# ------------------------------------------------------------- bake ----


def test_mip_chain_matches_independent_boxfilter():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 6, 4), dtype=np.uint8)
    m1 = _mip_next(img)
    # Independent recomputation (edge-repeat odd dims, round half up).
    ref = np.zeros((4, 3, 4), np.uint16)
    padded = np.concatenate([img, img[:, -1:]], axis=1)  # w 6→6? (even)
    assert padded.shape[1] == 7  # odd→ repeat makes 7? no: 6 is even
    # 6 is even so no pad; recompute directly:
    for y in range(4):
        for x in range(3):
            blk = img[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].astype(np.uint16)
            ref[y, x] = (blk.sum(axis=(0, 1)) + 2) // 4
    np.testing.assert_array_equal(m1, ref.astype(np.uint8))
    # Chain terminates at 1×1.
    m = img
    while m.shape[0] > 1 or m.shape[1] > 1:
        m = _mip_next(m)
    assert m.shape[:2] == (1, 1)


def test_bake_auto_gate_and_layout():
    path, _ = _gradient_png(256)
    _, on = _scene(path)  # 256² > resident budget → auto-on
    L = int(on.tex_mip_offset.shape[1])
    assert L == 9  # 256 → 1 is 9 levels
    fit = np.asarray(on.tex_fit_level)
    offs = np.asarray(on.tex_mip_offset)
    ws = np.asarray(on.tex_mip_w)
    hs = np.asarray(on.tex_mip_h)
    # Coarse chains live in the fallback region; fine levels after it.
    fb = on.fb_rows
    assert fb in (16, 32, 64, 128)
    for k in range(offs.shape[0]):
        for l in range(L):
            end = offs[k, l] + ws[k, l] * hs[k, l]
            if l >= fit[k]:
                assert end <= fb * 128, (k, l)
            elif ws[k, l] > 1 or hs[k, l] > 1:
                assert offs[k, l] >= fb * 128, (k, l)
    # Level sizes halve down the chain (big texture = index 1).
    assert ws[1, 0] == 256 and ws[1, 1] == 128 and ws[1, 8] == 1
    # Mips off (small texture) → trivial L = 1 arrays.
    small, _ = _checker_png(32)
    _, off = _scene(small)
    assert int(off.tex_mip_offset.shape[1]) == 1
    # Explicit off for a big texture keeps round-2 behavior.
    _, off2 = _scene(path, mipmaps=False)
    assert int(off2.tex_mip_offset.shape[1]) == 1


def test_mip_level_math():
    import jax.numpy as jnp

    t = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    # footprint = t·(2/h)·tan_y·density with h=2, tan_y=1 → = density.
    dens = jnp.asarray([0.5, 1.9, 2.0, 63.9])
    lvl = mips.mip_level(t, jnp.float32(1.0), 2, dens, 8)
    np.testing.assert_array_equal(np.asarray(lvl), [0, 0, 1, 5])


# ------------------------------------------------ minification quality ----


def test_minification_aliasing_reduced():
    """VERDICT r2 #3 'Done' condition: a fine checkerboard viewed at
    distance aliases without mips (pixel values swing to the extremes)
    and converges to mid-gray with them."""
    path, _ = _checker_png(256, cell=2)
    state, scene_mip = _scene(path, uv_scale=16.0)
    _, scene_base = _scene(path, uv_scale=16.0, mipmaps=False)
    a = rt_ref(state, scene_mip, height=48, width=48)
    b = rt_ref(state, scene_base, height=48, width=48)
    # Far half of the image (top rows = distant ground).
    far_a = np.asarray(a.rgb)[0, 0, 8:20, :, 0].astype(np.float32)
    far_b = np.asarray(b.rgb)[0, 0, 8:20, :, 0].astype(np.float32)
    # Base-level sampling: each pixel lands on a black or white cell →
    # huge variance. Mip sampling: averaged cells → near-constant gray.
    assert far_b.std() > 4 * far_a.std(), (far_a.std(), far_b.std())


# ------------------------------------------------------- pallas parity ----


@pytest.mark.parametrize("filt", ["nearest", "bilinear"])
@pytest.mark.parametrize("hw", [(48, 48), (64, 256)])
def test_paged_parity_smooth(filt, hw):
    h, w = hw
    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=2.0, y=4.0))
    assert int(scene.tex_mip_offset.shape[1]) > 1
    a = rt_ref(state, scene, height=h, width=w, texture_filter=filt)
    b = rt_pal(state, scene, height=h, width=w, interpret=True,
               texture_filter=filt)
    d = np.abs(np.asarray(a.rgb, np.int16) - np.asarray(b.rgb, np.int16))
    assert d.max() <= 2, (filt, hw, d.max())
    # Depth/segmask unaffected by texturing: exact.
    assert np.allclose(np.asarray(a.depth), np.asarray(b.depth), atol=1e-5)


@pytest.mark.parametrize("hw", [(48, 48), (64, 256)])
def test_paged_window_reuse_bitwise(hw, monkeypatch):
    """MRT_TEX_REUSE (cross-program page-window reuse) is a pure DMA
    skip: identical windows re-use the resident scratch, so outputs must
    be BITWISE identical with the knob on and off. 3 identical worlds at
    48² give single-tile worlds whose consecutive programs share the
    window (guaranteed reuse hits); 64×256 mixes per-tile windows
    (hit + miss + re-DMA transitions within each world)."""
    h, w = hw
    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=2.0, y=4.0),
                          n_worlds=3)
    assert int(scene.tex_mip_offset.shape[1]) > 1

    def render(reuse):
        monkeypatch.setenv("MRT_TEX_REUSE", reuse)
        rt_pal.clear_cache()  # knobs are read at trace time
        return rt_pal(state, scene, height=h, width=w, interpret=True)

    on = render("1")
    off = render("0")
    monkeypatch.delenv("MRT_TEX_REUSE")
    rt_pal.clear_cache()
    np.testing.assert_array_equal(np.asarray(on.rgb), np.asarray(off.rgb))
    np.testing.assert_array_equal(np.asarray(on.depth),
                                  np.asarray(off.depth))
    a = rt_ref(state, scene, height=h, width=w)
    d = np.abs(np.asarray(a.rgb, np.int16) - np.asarray(on.rgb, np.int16))
    assert d.max() <= 2, d.max()


def test_paged_overflow_clamp_parity():
    """uv·64 over a 256² texture: tile windows overflow and every tile
    falls back to the coarse chains — both paths, identically."""
    path, _ = _gradient_png(256)
    state, scene = _scene(path, uv_scale=63.7)
    a = rt_ref(state, scene, height=32, width=32)
    b = rt_pal(state, scene, height=32, width=32, interpret=True)
    _assert_close_modulo_boundaries(a, b)


def test_paged_shadows_parity():
    from madrona_renderer_tpu.core.scene import configure_lighting

    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=3.0, y=5.0))
    scene = configure_lighting(scene, (1.0, 1.0, 0.0), (1, 1, 1))
    a = rt_ref(state, scene, height=32, width=32, shadows=True)
    b = rt_pal(state, scene, height=32, width=32, interpret=True,
               shadows=True)
    _assert_close_modulo_boundaries(a, b)
    # Shadows actually darken something.
    c = rt_pal(state, scene, height=32, width=32, interpret=True)
    assert (np.asarray(b.rgb) != np.asarray(c.rgb)).any()


def test_paged_raster_parity():
    from madrona_renderer_tpu.ops.raster_pallas import rasterize as rast_pal
    from madrona_renderer_tpu.ops.raster_ref import rasterize as rast_ref

    path, _ = _gradient_png(256)
    state, scene = _scene(path)
    a = rast_ref(state, scene, height=32, width=32)
    b = rast_pal(state, scene, height=32, width=32, interpret=True)
    _assert_close_modulo_boundaries(a, b)


def test_paged_with_dma_streamed_mesh():
    """Big mesh (cluster DMA) + big texture (page DMA) in one kernel —
    the two DMA machineries must coexist."""
    rng = np.random.default_rng(31)
    n_tris = 3600
    centers = rng.uniform(-30, 30, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 50, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32)
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32)
    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=tris)
    from madrona_renderer_tpu.core.scene import SMEM_TRI_BUDGET
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    S = state.instance_obj.shape[1] * scene.tris_per_object
    assert rp._N_TRI_ROWS * S * 4 > SMEM_TRI_BUDGET, "must trigger tri-DMA"
    assert int(scene.tex_mip_offset.shape[1]) > 1
    a = rt_ref(state, scene, height=16, width=16)
    b = rt_pal(state, scene, height=16, width=16, interpret=True,
               accel="clusters")
    _assert_close_modulo_boundaries(a, b, frac=0.05)


def test_manager_mipmaps_config():
    import dataclasses

    from madrona_renderer_tpu.manager import Manager
    from madrona_renderer_tpu.runners.scenes import demo_config
    from madrona_renderer_tpu.config import RenderMode

    cfg = demo_config(2, RenderMode.Raytracer, 32, 32)
    m = Manager(dataclasses.replace(cfg, mipmaps=True))
    m.step()
    assert m.rgb_tensor().numpy().shape == (2, 32, 32, 4)


def test_per_pixel_window_clamp_keeps_magnified_sharp():
    """A wrapped-uv floor (huge fine-row span) shares the view with a
    close-up textured quad: the per-pixel window clamp anchors the DMA
    window at the magnified pixels, so THEY keep base-level texels while
    only the floor falls back to coarse mips (round-3 fix: the old
    per-tile all-or-nothing clamp blurred the whole view)."""
    import jax.numpy as jnp

    from madrona_renderer_tpu.ops import mips

    path, img = _gradient_png(256)
    # Close-up quad (textured, uv 0..1 → level 0, small row span) in
    # front of a far floor with wild uv wrap — SAME textured material.
    import numpy as np

    import tests.helpers as H
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.config import WorldInit

    geo = H.geo_from_meshes(
        [quad_xz(half=60.0, y=0.0), quad_xz(half=2.5, y=4.0)],
        uvs=[quad_uvs() * 40.0, quad_uvs() * 0.07],
        materials=[0, 0],
    )
    merged = load_render_assets(
        geo, [], [AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0)],
        [path],
    )
    scene = bake_scene(merged)
    state = init_state(
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0),
         ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=1)],
        [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
        [WorldInit(num_instances=2, instance_offset=0, num_cameras=1,
                   camera_offset=0)],
    )

    a = rt_ref(state, scene, height=32, width=32)
    # Reconstruct the clamp decision on the ref path to assert levels.
    from madrona_renderer_tpu.ops.raytrace_ref import (
        build_world_soup, camera_ray_dirs, intersect_bruteforce,
        _gather_soup, _moller_trumbore,
    )

    soup = build_world_soup(state, scene)
    eff_fov = jnp.full((1, 1), 90.0, jnp.float32)
    dirs = camera_ray_dirs(state.camera_rot, 32, 32, eff_fov)
    t, idx, hit = intersect_bruteforce(
        soup, state.camera_pos, dirs,
        jnp.full((1, 1), 0.1, jnp.float32),
        jnp.full((1, 1), 1000.0, jnp.float32),
    )
    o = state.camera_pos[:, :, None, :]
    bv0 = _gather_soup(soup.v0, idx)
    be1 = _gather_soup(soup.e1, idx)
    be2 = _gather_soup(soup.e2, idx)
    _, u, v, _ = _moller_trumbore(o, dirs, bv0, be1, be2)
    u = jnp.clip(u, 0, 1)
    v = jnp.clip(v, 0, 1)
    uv = (_gather_soup(soup.uv0, idx) + u[..., None] *
          _gather_soup(soup.duv1, idx) + v[..., None] *
          _gather_soup(soup.duv2, idx))
    mat = _gather_soup(soup.mat, idx)
    seg = np.asarray(a.segmask)[0, 0].reshape(-1)
    dens = _gather_soup(soup.density, idx)
    L = int(scene.tex_mip_offset.shape[1])
    tan_y = jnp.ones((1, 1), jnp.float32)
    lvl = mips.mip_level(t, tan_y[:, :, None], 32, dens, L)
    tex_id = scene.mat_tex[mat]
    tile_sub, tiles_x, n_tiles = mips.tile_geometry(32, 32)
    tid = mips.tile_ids(32, 32, tile_sub, tiles_x)
    lvl_c = np.asarray(mips.clamp_levels(
        scene, tex_id, uv, lvl, hit, tid, n_tiles, "nearest"
    )[0])[0, 0]
    lvl_u = np.asarray(lvl)[0, 0]
    near_quad = (seg == 1) & (lvl_u == 0)  # magnified close-up pixels
    floor = seg == 0
    assert near_quad.any() and floor.any()
    # Magnified pixels keep level 0 (the window anchors at them)...
    assert (lvl_c[near_quad] == 0).all(), np.unique(lvl_c[near_quad])
    # ...while some floor pixels in the same tiles were bumped coarse.
    # The magnified quad pixels page FINE rows (level 0 of a 256² texture
    # is far outside the resident region) — the anchor preference is
    # genuinely exercised, not satisfied by coarse-resident sampling.
    offs = np.asarray(scene.tex_mip_offset)
    assert offs[1, 0] >= scene.fb_rows * 128
    fit = int(np.asarray(scene.tex_fit_level)[1])
    assert (lvl_c[floor] >= np.minimum(lvl_u[floor], fit)).all()
    # And the kernel agrees with the ref under this mixed load.
    b = rt_pal(state, scene, height=32, width=32, interpret=True)
    _assert_close_modulo_boundaries(a, b)


def test_mip_scene_golden():
    """Golden-image regression for the mip/paged path (jnp-ref-generated
    on CPU, committed): locks the mip chain, level-selection, and clamp
    semantics against accidental drift. Both impls compared (pallas with
    the boundary-tolerant contract)."""
    from madrona_renderer_tpu.assets.png import read_png

    gdir = os.path.join(os.path.dirname(__file__), "goldens")
    want = read_png(os.path.join(gdir, "mip_rgb_world0.png"))
    want_d = np.load(os.path.join(gdir, "mip_depth_world0.npy"))

    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=2.0, y=4.0))
    a = rt_ref(state, scene, height=48, width=48)
    np.testing.assert_array_equal(np.asarray(a.rgb)[0, 0], want)
    np.testing.assert_allclose(
        np.asarray(a.depth)[0, 0], want_d, rtol=1e-4, atol=1e-4
    )
    b = rt_pal(state, scene, height=48, width=48, interpret=True)
    d = np.abs(np.asarray(b.rgb)[0, 0].astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 2, d.max()


def test_trilinear_parity_and_smoothness():
    """Trilinear (linear-mipmap-linear — the reference's hardware
    sampler default): exact jnp↔Pallas parity (the continuous blend is
    insensitive to ulp-level hit differences), visibly different from
    bilinear, and smooth across mip-level boundaries where per-level
    sampling steps."""
    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=2.0, y=4.0))
    a = rt_ref(state, scene, height=48, width=48,
               texture_filter="trilinear")
    b = rt_pal(state, scene, height=48, width=48, interpret=True,
               texture_filter="trilinear")
    d = np.abs(np.asarray(a.rgb, np.int16) - np.asarray(b.rgb, np.int16))
    assert d.max() <= 1, d.max()
    bl = rt_ref(state, scene, height=48, width=48,
                texture_filter="bilinear")
    assert (np.asarray(a.rgb) != np.asarray(bl.rgb)).any()


def test_trilinear_2d_tiles_and_raster():
    from madrona_renderer_tpu.ops.raster_pallas import rasterize as rast_pal
    from madrona_renderer_tpu.ops.raster_ref import rasterize as rast_ref

    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=2.0, y=4.0))
    a = rt_ref(state, scene, height=48, width=256,
               texture_filter="trilinear")
    b = rt_pal(state, scene, height=48, width=256, interpret=True,
               texture_filter="trilinear")
    d = np.abs(np.asarray(a.rgb, np.int16) - np.asarray(b.rgb, np.int16))
    assert d.max() <= 1, d.max()
    ar = rast_ref(state, scene, height=32, width=32,
                  texture_filter="trilinear")
    br = rast_pal(state, scene, height=32, width=32, interpret=True,
                  texture_filter="trilinear")
    dr = np.abs(np.asarray(ar.rgb, np.int16) - np.asarray(br.rgb, np.int16))
    assert dr.max() <= 1, dr.max()


def test_trilinear_without_mips_is_loud():
    small, _ = _checker_png(32)
    state, scene = _scene(small)  # auto → mips off (small pool)
    assert int(scene.tex_mip_offset.shape[1]) == 1
    with pytest.raises(ValueError, match="trilinear"):
        rt_ref(state, scene, height=16, width=16,
               texture_filter="trilinear")
    with pytest.raises(ValueError, match="trilinear"):
        rt_pal(state, scene, height=16, width=16, interpret=True,
               texture_filter="trilinear")


def test_trilinear_with_shadows_parity():
    from madrona_renderer_tpu.core.scene import configure_lighting

    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=quad_xz(half=3.0, y=5.0))
    scene = configure_lighting(scene, (1.0, 1.0, 0.0), (1, 1, 1))
    a = rt_ref(state, scene, height=32, width=32, shadows=True,
               texture_filter="trilinear")
    b = rt_pal(state, scene, height=32, width=32, interpret=True,
               shadows=True, texture_filter="trilinear")
    d = np.abs(np.asarray(a.rgb, np.int16) - np.asarray(b.rgb, np.int16))
    assert d.max() <= 1, d.max()
    c = rt_pal(state, scene, height=32, width=32, interpret=True,
               texture_filter="trilinear")
    assert (np.asarray(b.rgb) != np.asarray(c.rgb)).any()


def _clamped_levels_for(state, scene, filt, res=32):
    """Helper: per-pixel (unclamped, clamped) levels + segmask on the
    jnp reference path, mirroring finish_frames' mip block."""
    import jax.numpy as jnp

    from madrona_renderer_tpu.ops import mips
    from madrona_renderer_tpu.ops.raytrace_ref import (
        _gather_soup, _moller_trumbore, build_world_soup, camera_ray_dirs,
        intersect_bruteforce,
    )

    soup = build_world_soup(state, scene)
    eff_fov = jnp.full((1, 1), 90.0, jnp.float32)
    dirs = camera_ray_dirs(state.camera_rot, res, res, eff_fov)
    t, idx, hit = intersect_bruteforce(
        soup, state.camera_pos, dirs,
        jnp.full((1, 1), 0.1, jnp.float32),
        jnp.full((1, 1), 1000.0, jnp.float32),
    )
    o = state.camera_pos[:, :, None, :]
    bv0 = _gather_soup(soup.v0, idx)
    be1 = _gather_soup(soup.e1, idx)
    be2 = _gather_soup(soup.e2, idx)
    _, u, v, _ = _moller_trumbore(o, dirs, bv0, be1, be2)
    u = jnp.clip(u, 0, 1)
    v = jnp.clip(v, 0, 1)
    uv = (_gather_soup(soup.uv0, idx) + u[..., None] *
          _gather_soup(soup.duv1, idx) + v[..., None] *
          _gather_soup(soup.duv2, idx))
    mat = _gather_soup(soup.mat, idx)
    dens = _gather_soup(soup.density, idx)
    L = int(scene.tex_mip_offset.shape[1])
    tan_y = jnp.ones((1, 1), jnp.float32)
    lvl = mips.mip_level(t, tan_y[:, :, None], res, dens, L)
    tex_id = scene.mat_tex[mat]
    tile_sub, tiles_x, n_tiles = mips.tile_geometry(res, res)
    tid = mips.tile_ids(res, res, tile_sub, tiles_x)
    blend = None
    if filt == "trilinear":
        blend = mips.mip_blend_weight(t, tan_y[:, :, None], res, dens, lvl)
    lvl_c, kill = mips.clamp_levels(
        scene, tex_id, uv, lvl, hit, tid, n_tiles, filt,
        tile_clamp_blend=blend,
    )
    seg = np.asarray(_gather_soup(soup.seg, idx))[0, 0]
    seg = np.where(np.asarray(hit)[0, 0], seg, -1)
    kill = None if kill is None else np.asarray(kill)[0, 0]
    return np.asarray(lvl)[0, 0], np.asarray(lvl_c)[0, 0], seg, kill


def _two_quad_scene(path, close_uv_lo, close_uv_hi):
    import tests.helpers as H
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state
    from madrona_renderer_tpu.config import WorldInit

    span = close_uv_hi - close_uv_lo
    geo = H.geo_from_meshes(
        [quad_xz(half=60.0, y=0.0), quad_xz(half=2.5, y=4.0)],
        uvs=[quad_uvs() * 40.0, quad_uvs() * span + close_uv_lo],
        materials=[0, 0],
    )
    merged = load_render_assets(
        geo, [], [AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0)],
        [path],
    )
    scene = bake_scene(merged)
    state = init_state(
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0),
         ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=1)],
        [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
        [WorldInit(num_instances=2, instance_offset=0, num_cameras=1,
                   camera_offset=0)],
    )
    return state, scene


def test_trilinear_magnified_not_evicted():
    """Review finding r3: a close-up's level-0 pixels keep level 0 under
    trilinear exactly as under bilinear — pixels whose blend would reach
    into level 1 (footprint > 1) degrade to bilinear-at-0 (kill mask)
    instead of evicting to the coarse chain (three-tier degradation)."""
    path, _ = _gradient_png(256)
    state, scene = _two_quad_scene(path, 0.40, 0.47)
    for filt in ("bilinear", "trilinear"):
        lvl_u, lvl_c, seg, kill = _clamped_levels_for(state, scene, filt)
        mag = (seg == 1) & (lvl_u == 0)
        assert mag.sum() > 100, (filt, mag.sum())
        assert (lvl_c[mag] == 0).all(), (filt, np.unique(lvl_c[mag]))
        if filt == "trilinear":
            # The close quad straddles footprint 1.0: some pixels blend
            # (kill fires — level 1 is ~300 pool rows away), some don't.
            assert kill[mag].any()
            assert (~kill[mag]).any()
        else:
            assert kill is None


def test_seam_pixels_do_not_drag_window():
    """Review finding r3: a magnified pixel whose bilinear tap wraps the
    uv seam must clamp only ITSELF coarse — interior pixels keep their
    window (previously one seam pixel evicted the whole close-up)."""
    path, _ = _gradient_png(256)
    state, scene = _two_quad_scene(path, 0.0, 0.07)  # touches the seam
    lvl_u, lvl_c, seg, _ = _clamped_levels_for(state, scene, "bilinear")
    mag = (seg == 1) & (lvl_u == 0)
    assert mag.sum() > 100
    kept = (lvl_c[mag] == 0).mean()
    assert kept > 0.8, kept  # interior pixels keep level 0
    # Kernel parity still holds on this scene.
    a = rt_ref(state, scene, height=32, width=32, texture_filter="bilinear")
    b = rt_pal(state, scene, height=32, width=32, interpret=True,
               texture_filter="bilinear")
    _assert_close_modulo_boundaries(a, b)


def test_trilinear_untextured_mxu_shadows_no_raise():
    """Review finding r3: an untextured scene must not trip the
    trilinear-needs-mips guard (filter is irrelevant without textures),
    matching the jnp reference's behavior."""
    from tests.helpers import build, quad_xz as qz

    state, scene = build(
        [qz(half=50.0, y=0.0)],
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
    )
    f = rt_pal(state, scene, height=16, width=16, interpret=True,
               shadows=True, accel="mxu", texture_filter="trilinear")
    assert f.rgb.shape == (1, 1, 16, 16, 4)


def test_paged_with_dmxu_mesh(monkeypatch):
    """Deferred-MXU sweep + paged textures: the texel-density carry
    passes through the matmul sweep (cr[8]) and resolves per cluster —
    page DMA and the MXU cluster sweep must coexist."""
    monkeypatch.setenv("MRT_DEFERRED_MXU", "1")
    rng = np.random.default_rng(31)
    n_tris = 3600
    centers = rng.uniform(-30, 30, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 50, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32)
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32)
    path, _ = _gradient_png(256)
    state, scene = _scene(path, extra_mesh=tris)
    a = rt_ref(state, scene, height=16, width=16)
    b = rt_pal(state, scene, height=16, width=16, interpret=True,
               accel="clusters")
    _assert_close_modulo_boundaries(a, b, frac=0.05)
