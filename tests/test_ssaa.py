"""SSAA quality tier (ops/ssaa.py): exact supersample semantics, edge
softening, warmstart composition, and the raster path.

The reference point-samples one ray per output texel (src/mgr.cpp:443-492);
ssaa=s is a beyond-reference tier pinned here against its definition:
render at s x, integer box-filter rgb, center-subsample depth/segmask."""

import numpy as np
import pytest

import madrona_renderer_tpu as m

from tests.fixtures import ensure_fixtures, smoke_scene


def _renderer(res, mode=m.RenderMode.Raytracer, **extra):
    kw = smoke_scene(ensure_fixtures())
    return m.MadronaRenderer(
        gpu_id=0,
        num_worlds=4,
        render_mode=mode,
        batch_render_view_width=res,
        batch_render_view_height=res,
        **kw,
        **extra,
    )


def _manual_downsample_rgb(rgb, s):
    n, hs, ws, ch = rgb.shape
    h, w = hs // s, ws // s
    acc = rgb.astype(np.int64).reshape(n, h, s, w, s, ch).sum(axis=(2, 4))
    return ((acc + (s * s) // 2) // (s * s)).astype(np.uint8)


def _center_subsample(x, s):
    n, hs, ws = x.shape[:3]
    mid = s // 2
    return x.reshape((n, hs // s, s, ws // s, s) + x.shape[3:])[:, :, mid, :, mid]


def test_ssaa_matches_manual_supersample():
    """ssaa=2 at 32 == the 64-pixel render box-filtered down, bitwise."""
    a = _renderer(32, ssaa=2)
    b = _renderer(64)
    rgb_a = a.rgb_tensor().numpy()
    assert rgb_a.shape == (4, 32, 32, 4)
    np.testing.assert_array_equal(
        rgb_a, _manual_downsample_rgb(b.rgb_tensor().numpy(), 2))
    np.testing.assert_array_equal(
        a.depth_tensor().numpy(), _center_subsample(b.depth_tensor().numpy(), 2))
    np.testing.assert_array_equal(
        a.segmask_tensor().numpy(),
        _center_subsample(b.segmask_tensor().numpy(), 2))


def test_ssaa_softens_edges():
    """Supersampling must actually change silhouette pixels vs the
    point-sampled render at the same output resolution."""
    a = _renderer(32, ssaa=2).rgb_tensor().numpy()
    c = _renderer(32).rgb_tensor().numpy()
    assert (a != c).any()
    # Blended edge pixels carry values absent from the point-sampled
    # image (intermediate between object and background colors).
    assert len(np.setdiff1d(a[..., :3], c[..., :3])) > 0


def test_ssaa_warmstart_composes():
    """warmstart=True + ssaa=2: every step bitwise-equals the cold
    ssaa=2 render (the upsampled low-res seed is still a valid seed)."""
    # impl='pallas' (interpret mode on CPU): the seeded search window is
    # a kernel feature, so warmstart gates off the jnp path. Tiny res —
    # interpret-mode warmstart compiles three kernels.
    warm = _renderer(16, ssaa=2, warmstart=True, impl="pallas")
    cold = _renderer(16, ssaa=2, impl="pallas")
    for step in range(2):
        for r in (warm, cold):
            pos = r.instance_position_tensor().to_torch()
            pos[0][2] += 2.0  # world 0: slide the cube between steps
            r.step()
        np.testing.assert_array_equal(
            warm.rgb_tensor().numpy(), cold.rgb_tensor().numpy(),
            err_msg=f"step {step}")
        np.testing.assert_array_equal(
            warm.depth_tensor().numpy(), cold.depth_tensor().numpy())
        np.testing.assert_array_equal(
            warm.segmask_tensor().numpy(), cold.segmask_tensor().numpy())


def test_ssaa_raster_mode():
    a = _renderer(32, mode=m.RenderMode.Rasterizer, ssaa=2)
    b = _renderer(64, mode=m.RenderMode.Rasterizer)
    np.testing.assert_array_equal(
        a.rgb_tensor().numpy(),
        _manual_downsample_rgb(b.rgb_tensor().numpy(), 2))
    # Raster depth export carries a trailing singleton dim
    # (src/mgr.cpp:570-580).
    np.testing.assert_array_equal(
        a.depth_tensor().numpy()[..., 0],
        _center_subsample(b.depth_tensor().numpy()[..., 0], 2))


def test_ssaa_validation():
    with pytest.raises(ValueError, match="ssaa"):
        _renderer(16, ssaa=0)
