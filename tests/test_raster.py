"""Rasterizer-mode tests: raster conventions (camera-plane depth, raster
near plane, no segmask) and Manager integration."""

import numpy as np
import pytest

import madrona_renderer_tpu as m
from madrona_renderer_tpu.config import ImportedInstance
from madrona_renderer_tpu.ops.raster_ref import rasterize
from madrona_renderer_tpu.ops.raytrace_ref import raytrace

from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz


def inst(pos, **kw):
    return ImportedInstance(position=list(pos), rotation=kw.pop("rot", [1, 0, 0, 0]),
                            scale=kw.pop("scale", [1, 1, 1]), object_id=kw.pop("obj", 0))


def test_raster_depth_is_camera_plane_distance():
    """A wall at y=10 has constant raster depth 10 across the whole image
    (z-buffer semantics), unlike ray distance which grows off-center."""
    state, scene = build(
        [quad_xz(half=1000.0, y=0.0)], [inst((0, 10, 0))], [cam_at_origin_looking_plus_y()]
    )
    f = rasterize(state, scene, height=8, width=8)
    depth = np.asarray(f.depth)[0, 0]
    np.testing.assert_allclose(depth, 10.0, rtol=1e-4)
    # Raytrace depth differs off-center.
    rt = np.asarray(raytrace(state, scene, height=8, width=8).depth)[0, 0]
    assert rt[0, 0] > 10.5


def test_raster_visibility_matches_raytrace():
    """Same camera model → identical visibility/coverage in both modes."""
    state, scene = build(
        [quad_xz(half=3.0, y=0.0)],
        [inst((0, 10, 0)), inst((1.5, 6, 1.0), scale=[0.4, 1, 0.4])],
        [cam_at_origin_looking_plus_y()],
    )
    rast = rasterize(state, scene, height=32, width=32)
    rt = raytrace(state, scene, height=32, width=32, near=0.001)
    np.testing.assert_array_equal(
        np.asarray(rast.depth)[0, 0] > 0, np.asarray(rt.depth)[0, 0] > 0
    )
    np.testing.assert_array_equal(np.asarray(rast.rgb), np.asarray(rt.rgb))


def test_raster_near_plane_uses_view_default():
    """znear=0.001 (attachEntityToView default) — geometry at y=0.05 is
    visible under raster but clipped by the raytracer's 0.1."""
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)], [inst((0, 0.05, 0))], [cam_at_origin_looking_plus_y()]
    )
    rast = rasterize(state, scene, height=4, width=4)
    assert (np.asarray(rast.depth)[0, 0] > 0).all()
    rt = raytrace(state, scene, height=4, width=4)
    assert (np.asarray(rt.depth)[0, 0] == 0).all()


def test_raster_no_segmask():
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)], [inst((0, 10, 0))], [cam_at_origin_looking_plus_y()]
    )
    f = rasterize(state, scene, height=4, width=4)
    assert (np.asarray(f.segmask) == -1).all()


def test_manager_rasterizer_mode(data_dir):
    from tests.fixtures import smoke_scene

    kw = smoke_scene(data_dir)
    r = m.MadronaRenderer(
        gpu_id=0,
        num_worlds=4,
        render_mode=m.RenderMode.Rasterizer,
        batch_render_view_width=32,
        batch_render_view_height=32,
        **kw,
    )
    rgb = r.rgb_tensor().numpy()
    assert rgb.shape == (4, 32, 32, 4)
    # Raster depth carries the trailing singleton (src/mgr.cpp:575-580).
    assert r.depth_tensor().shape == (4, 32, 32, 1)
    # Segmask errors like the reference FATAL (src/mgr.cpp:595).
    with pytest.raises(RuntimeError, match="Segmask not implemented"):
        r.segmask_tensor()
    # Content present.
    assert (rgb[..., :3].sum(axis=-1) > 0).any()
