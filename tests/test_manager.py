"""Manager / public-API tests: the reference smoke-test scene end-to-end
(scripts/test.py:112-163 semantics), export shapes/dtypes, and the in-place
mutation contract."""

import numpy as np
import pytest

import madrona_renderer_tpu as m

from tests.fixtures import smoke_scene


@pytest.fixture(scope="module")
def renderer():
    from tests.fixtures import ensure_fixtures

    kw = smoke_scene(ensure_fixtures())
    return m.MadronaRenderer(
        gpu_id=0,
        num_worlds=4,
        render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=64,
        batch_render_view_height=64,
        **kw,
    )


def test_export_shapes_and_dtypes(renderer):
    # Shapes per reference src/mgr.cpp:547-605 (raytracer branch), with the
    # camera-tensor count bug fixed (src/mgr.cpp:652,662 used instance count).
    rgb = renderer.rgb_tensor().numpy()
    assert rgb.shape == (4, 64, 64, 4) and rgb.dtype == np.uint8
    depth = renderer.depth_tensor().numpy()
    assert depth.shape == (4, 64, 64) and depth.dtype == np.float32
    seg = renderer.segmask_tensor().numpy()
    assert seg.shape == (4, 64, 64) and seg.dtype == np.int32
    assert renderer.instance_position_tensor().shape == (8, 3)
    assert renderer.instance_rotation_tensor().shape == (8, 4)
    assert renderer.camera_position_tensor().shape == (4, 3)
    assert renderer.camera_rotation_tensor().shape == (4, 4)


def test_ctor_primes_observations(renderer):
    # The ctor steps once (reference src/mgr.cpp:524): tensors are valid
    # without an explicit step().
    assert (renderer.rgb_tensor().numpy()[..., 3] == 255).all()
    assert (renderer.segmask_tensor().numpy() >= -1).all()


def test_scene_content(renderer):
    seg = renderer.segmask_tensor().numpy()
    # Both instances (cube=0, triangle=1) visible in every world.
    for w in range(4):
        vals = set(np.unique(seg[w]))
        assert vals == {-1, 0, 1}


def test_inplace_mutation_contract(renderer):
    """positions mutated through the exported tensor must be visible to the
    next step (reference scripts/test.py:144-150)."""
    before = renderer.rgb_tensor().numpy().copy()
    pos = renderer.instance_position_tensor().to_torch()
    pos[0][2] += 8.0  # world 0, cube
    renderer.step()
    after = renderer.rgb_tensor().numpy()
    assert (after[0] != before[0]).any()
    assert (after[1] == before[1]).all()
    assert (after[2] == before[2]).all()
    pos[0][2] -= 8.0
    renderer.step()
    restored = renderer.rgb_tensor().numpy()
    assert (restored[0] == before[0]).all()


def test_depth_tensor_positive_on_hits(renderer):
    depth = renderer.depth_tensor().numpy()
    seg = renderer.segmask_tensor().numpy()
    assert (depth[seg >= 0] > 0).all()
    assert (depth[seg == -1] == 0).all()


def test_device_ptrs(renderer):
    assert renderer.rgb_cuda_ptr() != 0
    assert renderer.depth_device_ptr() != 0


def test_to_jax_zero_copy(renderer):
    arr = renderer.rgb_tensor().to_jax()
    assert arr.shape == (4, 64, 64, 4)


def test_worldinit_count_mismatch_raises():
    from tests.fixtures import ensure_fixtures

    kw = smoke_scene(ensure_fixtures())
    with pytest.raises(ValueError):
        m.MadronaRenderer(
            gpu_id=0,
            num_worlds=3,  # but 4 WorldInit entries
            render_mode=m.RenderMode.Raytracer,
            batch_render_view_width=16,
            batch_render_view_height=16,
            **kw,
        )


def test_nonsquare_viewport():
    """Raytracer honors width≠height (fixed reference quirk,
    src/mgr.cpp:130,443)."""
    from tests.fixtures import ensure_fixtures

    kw = smoke_scene(ensure_fixtures())
    kw["worlds"] = kw["worlds"][:1]
    r = m.MadronaRenderer(
        gpu_id=0,
        num_worlds=1,
        render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=32,
        batch_render_view_height=16,
        **kw,
    )
    assert r.rgb_tensor().shape == (1, 16, 32, 4)


def test_time_singleton_advances(renderer):
    t0 = np.asarray(renderer.state.time).copy()
    renderer.step()
    t1 = np.asarray(renderer.state.time)
    np.testing.assert_allclose(t1 - t0, 0.05, atol=1e-6)


def test_dirty_flag_skips_untouched_upload():
    """Untouched steps must not re-upload transform mirrors; mutated ones
    must (and only the mutated array)."""
    from tests.fixtures import ensure_fixtures

    kw = smoke_scene(ensure_fixtures())
    mgr = m.MadronaRenderer(
        gpu_id=0,
        num_worlds=4,
        render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=64,
        batch_render_view_height=64,
        **kw,
    )
    # No tensor handed out yet → nothing can be dirty.
    before = mgr.state.instance_pos
    mgr.step()
    # donate_argnums consumes the buffer, but no *upload* happened: the
    # value fed to the step was the previous state's array object.
    assert not any(mgr._mirror_exported.values())

    pos = mgr.instance_position_tensor().to_torch()
    assert mgr._mirror_exported["inst_pos"]
    rgb_a = np.asarray(mgr.rgb_tensor().numpy()).copy()
    mgr.step()  # exported but unmutated → snapshot equal → no upload
    rgb_b = np.asarray(mgr.rgb_tensor().numpy())
    np.testing.assert_array_equal(rgb_a, rgb_b)

    pos[0][2] += 5.0
    mgr.step()
    rgb_c = np.asarray(mgr.rgb_tensor().numpy())
    assert not np.array_equal(rgb_b, rgb_c)
    del before
