"""Fused export epilogue (MRT_KERNEL_EXPORT) frame parity.

The fused path applies _frames_from_core's masks (hit, camera_valid,
raster far-clip, idx//T segmask) at the kernel's output writes
(raytrace_pallas.py fused-export epilogue) so the XLA epilogue's extra
read+write pass over three pixel-sized arrays disappears — measured
~10% of the headline step (tpu_epilogue_probe `core` variant, r5).
Frames must be BITWISE identical with the knob on vs off: every fused
mask mirrors an XLA select of the same operands (select of the packed
word == packed word of selects; integer divide by the static
tris/object constant is exact).

Scenes cover: plain shaded rt, raster (far-clip + no-segmask), the
in-kernel textured path, multi-camera worlds with INVALID camera slots
(ragged num_cameras → camera_valid = 0 rows, the mask the XLA epilogue
applies last), and invalid instances.

Reference anchor for the output semantics being preserved: the
RGB(u8×4)/Depth(f32)/Segmask(i32) export columns of
``RaycastOutputArchetype`` (reference ``src/sim.cpp:52-60``) and the
rasterizer's no-segmask surface (``src/mgr.cpp:595``).
"""

import numpy as np
import pytest

from madrona_renderer_tpu.config import (
    ImportedCamera, ImportedInstance, WorldInit,
)
from madrona_renderer_tpu.ops.raytrace_pallas import (
    rasterize as rast_pal, raytrace as rt_pal,
)

from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz
from tests.test_pack_kernel import _scene as _pack_scene


def _frames_equal(fa, fb):
    import dataclasses

    for fld in dataclasses.fields(fa):
        a, b = getattr(fa, fld.name), getattr(fb, fld.name)
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=fld.name
        )


def _ragged_cam_scene():
    """2 worlds, max 2 cameras, world 1 uses only 1 → camera_valid=0
    slot exercising the fused invalid-camera mask."""
    insts, cams, worlds = [], [], []
    for w in range(2):
        insts.append(ImportedInstance(
            position=[0.0, 6.0 + w, 0.0], rotation=[1, 0, 0, 0],
            scale=[1, 1, 1], object_id=0,
        ))
        cams.append(cam_at_origin_looking_plus_y())
    cams.append(cam_at_origin_looking_plus_y())  # world 0's second cam
    worlds = [
        WorldInit(num_instances=1, instance_offset=0, num_cameras=2,
                  camera_offset=0),
        WorldInit(num_instances=1, instance_offset=1, num_cameras=1,
                  camera_offset=2),
    ]
    return build([quad_xz(half=5.0, y=0.0)], insts, cams, worlds)


def _run(fn, state, scene, **kw):
    return fn(state, scene, height=32, width=64, interpret=True, **kw)


@pytest.mark.parametrize("case", ["rt", "rast", "textured", "ragged_cams"])
def test_fused_export_frames_bitwise(case, monkeypatch):
    if case == "textured":
        state, scene = _pack_scene(textured=True)
    elif case == "ragged_cams":
        state, scene = _ragged_cam_scene()
    else:
        state, scene = _pack_scene()
    fn = rast_pal if case == "rast" else rt_pal

    monkeypatch.setenv("MRT_KERNEL_EXPORT", "1")
    on = _run(fn, state, scene)
    monkeypatch.setenv("MRT_KERNEL_EXPORT", "0")
    off = _run(fn, state, scene)
    _frames_equal(on, off)
    assert (np.asarray(on.rgb)[..., 3] == 255).all()
    if case != "rast":
        assert (np.asarray(on.segmask) >= 0).any()


def test_fused_export_manager_drop_in(monkeypatch, data_dir):
    """Product surface: MadronaRenderer with the fused export on
    produces byte-identical tensors to the default path."""
    from tests.fixtures import smoke_scene

    import madrona_renderer_tpu as m

    def run():
        kw = smoke_scene(data_dir)
        r = m.MadronaRenderer(
            gpu_id=0, num_worlds=4, render_mode=m.RenderMode.Raytracer,
            batch_render_view_width=32, batch_render_view_height=32, **kw,
        )
        r.step()
        return (r.rgb_tensor().numpy(), r.depth_tensor().numpy(),
                r.segmask_tensor().numpy())

    monkeypatch.setenv("MRT_KERNEL_EXPORT", "1")
    on = run()
    monkeypatch.setenv("MRT_KERNEL_EXPORT", "0")
    off = run()
    for a, b in zip(on, off):
        np.testing.assert_array_equal(a, b)


def test_fused_export_invalid_camera_masked(monkeypatch):
    """The camera_valid=0 slot must read opaque black / depth 0 /
    segmask -1 under the fused path (the mask the XLA epilogue used to
    apply)."""
    state, scene = _ragged_cam_scene()
    monkeypatch.setenv("MRT_KERNEL_EXPORT", "1")
    f = _run(rt_pal, state, scene)
    rgb = np.asarray(f.rgb)
    assert (rgb[1, 1, ..., :3] == 0).all()
    assert (np.asarray(f.depth)[1, 1] == 0).all()
    assert (np.asarray(f.segmask)[1, 1] == -1).all()
    # The valid views still see geometry.
    assert (np.asarray(f.segmask)[0, 0] >= 0).any()
    assert (np.asarray(f.segmask)[1, 0] >= 0).any()
