"""Analytic correctness tests for the raytracer core.

Every expectation here is derivable by hand — plane-hit distances, occlusion
order, clip planes, camera geometry — so these tests pin the renderer's
semantics independent of any golden image.
"""

import numpy as np
import pytest

from madrona_renderer_tpu.config import ImportedCamera, ImportedInstance, WorldInit
from madrona_renderer_tpu.ops.raytrace_ref import camera_ray_dirs, raytrace

from tests.helpers import (
    IDENTITY_Q,
    build,
    cam_at_origin_looking_plus_y,
    quad_uvs,
    quad_xz,
)

import jax.numpy as jnp


def _render(state, scene, h=16, w=16, **kw):
    return raytrace(state, scene, height=h, width=w, **kw)


def inst(pos=(0, 0, 0), rot=IDENTITY_Q, scale=(1, 1, 1), obj=0):
    return ImportedInstance(position=list(pos), rotation=list(rot), scale=list(scale), object_id=obj)


# ---------------------------------------------------------------- camera ---
def test_ray_dirs_center_and_corners():
    dirs = np.asarray(camera_ray_dirs(jnp.asarray(IDENTITY_Q, jnp.float32), 4, 4, 90.0))
    dirs = dirs.reshape(4, 4, 3)
    # All unit length.
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)
    # Forward is +Y everywhere (identity camera).
    assert (dirs[..., 1] > 0).all()
    # Top-left pixel points left (-x) and up (+z).
    assert dirs[0, 0, 0] < 0 and dirs[0, 0, 2] > 0
    # Bottom-right pixel points right and down.
    assert dirs[3, 3, 0] > 0 and dirs[3, 3, 2] < 0
    # fov 90: extreme pixel centers at ndc ±0.75 → |dx/dy| = 0.75.
    np.testing.assert_allclose(dirs[0, 0, 0] / dirs[0, 0, 1], -0.75, atol=1e-5)


# ------------------------------------------------------------ plane depth ---
def test_plane_hit_depth_analytic():
    state, scene = build(
        [quad_xz(half=1000.0, y=0.0)],
        [inst(pos=(0, 10, 0))],
        [cam_at_origin_looking_plus_y()],
    )
    f = _render(state, scene, 8, 8)
    depth = np.asarray(f.depth)[0, 0]
    seg = np.asarray(f.segmask)[0, 0]
    assert (seg == 0).all()
    # Expected: t = 10 * |dir| / dir_y = 10 * sqrt(1 + a² + b²) with
    # a = ndc_x * tan45, b = ndc_z * tan45.
    ys = (np.arange(8) + 0.5) / 8
    xs = (np.arange(8) + 0.5) / 8
    a = (xs * 2 - 1)[None, :]
    b = (1 - ys * 2)[:, None]
    want = 10.0 * np.sqrt(1.0 + a * a + b * b)
    np.testing.assert_allclose(depth, want, rtol=1e-4)


def test_miss_outputs():
    # Small quad only in the image center; corners miss.
    state, scene = build(
        [quad_xz(half=1.0, y=0.0)],
        [inst(pos=(0, 10, 0))],
        [cam_at_origin_looking_plus_y()],
    )
    f = _render(state, scene, 16, 16)
    rgb = np.asarray(f.rgb)[0, 0]
    depth = np.asarray(f.depth)[0, 0]
    seg = np.asarray(f.segmask)[0, 0]
    assert seg[0, 0] == -1 and depth[0, 0] == 0.0
    assert (rgb[0, 0, :3] == 0).all() and rgb[0, 0, 3] == 255
    mid = 8
    assert seg[mid, mid] == 0 and depth[mid, mid] > 0


# -------------------------------------------------------------- occlusion ---
def test_occlusion_nearest_wins():
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [inst(pos=(0, 10, 0)), inst(pos=(0, 5, 0))],
        [cam_at_origin_looking_plus_y()],
    )
    f = _render(state, scene, 8, 8)
    assert (np.asarray(f.segmask)[0, 0] == 1).all()
    # Pixel (4,4) ray: ndc (0.125, -0.125) → t = 5·√(1+2·0.125²).
    np.testing.assert_allclose(
        np.asarray(f.depth)[0, 0, 4, 4], 5.0 * np.sqrt(1.03125), rtol=1e-4
    )


def test_backface_not_culled():
    quad = quad_xz(half=100.0, y=0.0)
    flipped = quad[[0, 2, 1, 3, 5, 4]]  # reverse winding
    state, scene = build(
        [flipped], [inst(pos=(0, 10, 0))], [cam_at_origin_looking_plus_y()]
    )
    f = _render(state, scene, 4, 4)
    assert (np.asarray(f.segmask)[0, 0] == 0).all()


# ------------------------------------------------------------ clip planes ---
def test_near_far_clipping():
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [inst(pos=(0, 0.05, 0)), inst(pos=(0, 1500.0, 0))],
        [cam_at_origin_looking_plus_y()],
    )
    f = _render(state, scene, 4, 4, near=0.1, far=1000.0)
    assert (np.asarray(f.segmask)[0, 0] == -1).all()
    # Same scene with wider clip range hits the near quad.
    f2 = _render(state, scene, 4, 4, near=0.01, far=1000.0)
    assert (np.asarray(f2.segmask)[0, 0] == 0).all()


# --------------------------------------------------------------- transforms ---
def test_instance_scale_shrinks_coverage():
    state_big, scene = build(
        [quad_xz(half=1.0, y=0.0)],
        [inst(pos=(0, 10, 0), scale=(8, 1, 8))],
        [cam_at_origin_looking_plus_y()],
    )
    state_small, _ = build(
        [quad_xz(half=1.0, y=0.0)],
        [inst(pos=(0, 10, 0), scale=(2, 1, 2))],
        [cam_at_origin_looking_plus_y()],
    )
    big = (np.asarray(_render(state_big, scene, 32, 32).segmask)[0, 0] >= 0).sum()
    small = (np.asarray(_render(state_small, scene, 32, 32).segmask)[0, 0] >= 0).sum()
    assert big > small > 0


def test_instance_rotation_moves_geometry():
    # Quad rotated 90° about X: plane normal flips from -Y to Z → edge-on
    # to the camera → near-zero coverage.
    state, scene = build(
        [quad_xz(half=5.0, y=0.0)],
        [inst(pos=(0, 10, 0), rot=[0.7071068, 0.7071068, 0, 0])],
        [cam_at_origin_looking_plus_y()],
    )
    f = _render(state, scene, 16, 16)
    cover = (np.asarray(f.segmask)[0, 0] >= 0).sum()
    assert cover <= 16  # essentially edge-on


# ------------------------------------------------------- worlds / cameras ---
def test_worlds_independent():
    cams = [cam_at_origin_looking_plus_y()]
    instances = [inst(pos=(0, 10, 0)), inst(pos=(0, 5000, 0))]
    worlds = [
        WorldInit(num_instances=1, instance_offset=0, num_cameras=1, camera_offset=0),
        WorldInit(num_instances=1, instance_offset=1, num_cameras=1, camera_offset=0),
    ]
    state, scene = build([quad_xz(half=100.0, y=0.0)], instances, cams, worlds=worlds)
    f = _render(state, scene, 4, 4)
    seg = np.asarray(f.segmask)
    assert (seg[0, 0] == 0).all()  # world 0 sees its quad
    assert (seg[1, 0] == -1).all()  # world 1's quad is beyond far plane


def test_invalid_camera_slots_render_blank():
    cams = [cam_at_origin_looking_plus_y(), cam_at_origin_looking_plus_y()]
    worlds = [
        WorldInit(num_instances=1, instance_offset=0, num_cameras=2, camera_offset=0),
        WorldInit(num_instances=1, instance_offset=0, num_cameras=1, camera_offset=0),
    ]
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)], [inst(pos=(0, 10, 0))], cams, worlds=worlds
    )
    f = _render(state, scene, 4, 4)
    seg = np.asarray(f.segmask)
    assert (seg[0] >= 0).all()  # both cameras of world 0 hit
    assert (seg[1, 0] >= 0).all()  # world 1 camera 0 hits
    assert (seg[1, 1] == -1).all()  # padded slot blank


# ------------------------------------------------------------ shading/tex ---
def test_texture_sampling_quadrants(tmp_path):
    """Quad textured with a 2x2 quadrant image: check each image quadrant
    picks the right texel color."""
    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial

    tex = np.zeros((2, 2, 4), np.uint8)
    tex[..., 3] = 255
    tex[0, 0, 0] = 255  # top-left texel (v≈1) red
    tex[0, 1, 1] = 255  # top-right green
    tex[1, 0, 2] = 255  # bottom-left (v≈0) blue
    tex[1, 1, :3] = 255  # bottom-right white
    path = str(tmp_path / "quad.png")
    write_png(path, tex)

    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [inst(pos=(0, 10, 0))],
        [cam_at_origin_looking_plus_y()],
        uvs=[quad_uvs()],
        mesh_materials=[0],
        additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0)],
        additional_textures=[path],
    )
    f = _render(state, scene, 16, 16)
    rgb = np.asarray(f.rgb)[0, 0]
    # Image top-left ↔ world (-x, +z) ↔ uv (0, 1) ↔ texel row 0 col 0 = red.
    tl = rgb[2, 2, :3].astype(int)
    tr = rgb[2, 13, :3].astype(int)
    bl = rgb[13, 2, :3].astype(int)
    br = rgb[13, 13, :3].astype(int)
    assert tl[0] > 2 * max(tl[1], tl[2], 1)
    assert tr[1] > 2 * max(tr[0], tr[2], 1)
    assert bl[2] > 2 * max(bl[0], bl[1], 1)
    assert abs(int(br[0]) - int(br[1])) <= 2 and abs(int(br[1]) - int(br[2])) <= 2


def test_lighting_lambert_direction():
    """Quad normal toward the light shades brighter than away-facing, and
    ambient keeps the dark side nonzero."""
    from madrona_renderer_tpu.core.scene import configure_lighting

    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [inst(pos=(0, 10, 0))],
        [cam_at_origin_looking_plus_y()],
    )
    # Light travelling straight +Y (into the quad front face).
    scene_lit = configure_lighting(scene, (0, 1, 0), (1, 1, 1))
    bright = np.asarray(_render(state, scene_lit, 4, 4).rgb)[0, 0, 2, 2, 0].astype(int)
    # Light travelling -Y (hits the back; front in shadow → ambient only).
    scene_dark = configure_lighting(scene, (0, -1, 0), (1, 1, 1))
    dark = np.asarray(_render(state, scene_dark, 4, 4).rgb)[0, 0, 2, 2, 0].astype(int)
    assert bright > dark > 0
    assert dark == pytest.approx(255 * 0.2, abs=2)  # AMBIENT


def test_multi_light_sum_and_parity():
    """N directional lights (the engine's configureLighting list form):
    contributions sum; the Pallas kernel matches the jnp reference."""
    from madrona_renderer_tpu.core.scene import configure_lighting
    from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as rt_pal

    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [inst(pos=(0, 10, 0))],
        [cam_at_origin_looking_plus_y()],
    )
    # Two dim lights from the same side: brighter than either alone, and
    # (pre-clip regime) close to the sum of the individual lambert terms.
    one = configure_lighting(scene, (0, 1, 0), (0.3, 0.3, 0.3))
    two = configure_lighting(
        scene,
        lights=[((0, 1, 0), (0.3, 0.3, 0.3)), ((0.3, 1, 0.2), (0.2, 0.2, 0.2))],
    )
    px = (0, 0, 2, 2, 0)
    b_one = int(np.asarray(_render(state, one, 4, 4).rgb)[px])
    b_two = int(np.asarray(_render(state, two, 4, 4).rgb)[px])
    assert b_two > b_one

    # Kernel parity with 2 lights (interpret mode).
    a = _render(state, two, 16, 16)
    b = rt_pal(state, two, height=16, width=16, interpret=True)
    diff = np.abs(
        np.asarray(a.rgb).astype(np.int16) - np.asarray(b.rgb).astype(np.int16)
    )
    assert diff.max() <= 1
    np.testing.assert_array_equal(np.asarray(a.segmask), np.asarray(b.segmask))

    # A light with the 'active=false' analog: simply omitted from the list
    # — single-light list equals the scalar form bitwise.
    listed = configure_lighting(scene, lights=[((0, 1, 0), (0.3, 0.3, 0.3))])
    np.testing.assert_array_equal(
        np.asarray(_render(state, one, 8, 8).rgb),
        np.asarray(_render(state, listed, 8, 8).rgb),
    )


# ------------------------------------------------- SURVEY §4 property set ---
def test_depth_monotonic_in_distance():
    """Depth monotonicity (SURVEY §4): the same quad rendered at strictly
    increasing distances yields strictly increasing depth at every hit
    pixel, and the hit footprint shrinks."""
    prev_depth = None
    prev_hits = None
    for dist in (6.0, 9.0, 14.0, 22.0):
        state, scene = build(
            [quad_xz(half=2.0, y=0.0)],
            [inst(pos=(0, dist, 0))],
            [cam_at_origin_looking_plus_y()],
        )
        f = _render(state, scene, 32, 32)
        seg = np.asarray(f.segmask)[0, 0]
        depth = np.asarray(f.depth)[0, 0]
        hits = seg >= 0
        assert hits.any()
        if prev_depth is not None:
            both = hits & prev_hits
            assert both.any()
            assert (depth[both] > prev_depth[both]).all()
            assert hits.sum() <= prev_hits.sum()
        prev_depth, prev_hits = depth, hits


def test_segmask_matches_instance_order():
    """segmask↔objectID consistency (SURVEY §4): the segmask value is the
    per-world *instance index*, invariant to which object each instance
    renders — swapping instance order swaps the labels with it."""
    quads = [quad_xz(half=1.5, y=0.0), quad_xz(half=4.0, y=0.0)]
    near = dict(pos=(-3, 8, 0))
    far = dict(pos=(3, 16, 0))
    a_state, a_scene = build(
        quads, [inst(**near, obj=0), inst(**far, obj=1)],
        [cam_at_origin_looking_plus_y()],
    )
    b_state, b_scene = build(
        quads, [inst(**far, obj=1), inst(**near, obj=0)],
        [cam_at_origin_looking_plus_y()],
    )
    seg_a = np.asarray(_render(a_state, a_scene, 32, 32).segmask)[0, 0]
    seg_b = np.asarray(_render(b_state, b_scene, 32, 32).segmask)[0, 0]
    # Same geometry either way → identical hit footprints; labels swap.
    np.testing.assert_array_equal(seg_a >= 0, seg_b >= 0)
    swap = np.full_like(seg_b, -1)
    swap[seg_b == 0] = 1
    swap[seg_b == 1] = 0
    np.testing.assert_array_equal(seg_a, swap)
