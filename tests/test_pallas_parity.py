"""Pallas kernel ↔ pure-jnp reference parity.

The jnp path is the semantic reference; the Pallas kernel must match it
bit-for-bit on every output (same math, same epsilons). Runs the kernel in
interpreter mode on CPU; the identical kernel compiles for real TPU.
"""

import numpy as np
import pytest

from madrona_renderer_tpu.config import (
    AdditionalMaterial, ImportedCamera, ImportedInstance, WorldInit,
)
from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_ref
from madrona_renderer_tpu.ops.raytrace_pallas import raytrace as rt_pal

from tests.fixtures import ensure_fixtures, smoke_scene
from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz


def _assert_frames_equal(a, b):
    # rgb within ±1 LSB: the kernel folds attribute interpolation into the
    # sweep, so float op ordering differs from the reference epilogue.
    rgb_a = np.asarray(a.rgb).astype(np.int16)
    rgb_b = np.asarray(b.rgb).astype(np.int16)
    diff = np.abs(rgb_a - rgb_b)
    assert diff.max() <= 1, f"rgb diff {diff.max()}"
    np.testing.assert_allclose(
        np.asarray(a.depth), np.asarray(b.depth), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(a.segmask), np.asarray(b.segmask))


def test_parity_simple_scene():
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [
            ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0),
            ImportedInstance(position=[0, 5, 0], rotation=[1, 0, 0, 0], scale=[0.05, 1, 0.05], object_id=0),
        ],
        [cam_at_origin_looking_plus_y()],
    )
    a = rt_ref(state, scene, height=64, width=64)
    b = rt_pal(state, scene, height=64, width=64, interpret=True)
    _assert_frames_equal(a, b)


def test_parity_smoke_scene_multiworld():
    """The reference smoke scene: textured cube + raw triangle, 4 worlds."""
    import madrona_renderer_tpu as m
    from madrona_renderer_tpu.assets.importer import load_render_assets
    from madrona_renderer_tpu.config import GeometryConfig
    from madrona_renderer_tpu.core.scene import bake_scene
    from madrona_renderer_tpu.core.state import init_state

    kw = smoke_scene(ensure_fixtures())
    geo = GeometryConfig(
        vertices=kw["mesh_vertices"],
        uvs=kw["mesh_uvs"],
        indices=kw["mesh_indices"],
        mesh_vertex_offsets=kw["mesh_vertex_offsets"],
        mesh_index_offsets=kw["mesh_indices_offsets"],
        mesh_materials=kw["mesh_materials"],
    )
    merged = load_render_assets(
        geo, kw["asset_paths"], kw["materials"], kw["texture_paths"]
    )
    scene = bake_scene(merged)
    state = init_state(kw["instances"], kw["cameras"], kw["worlds"])

    a = rt_ref(state, scene, height=64, width=64)
    b = rt_pal(state, scene, height=64, width=64, interpret=True)
    _assert_frames_equal(a, b)
    # Sanity: scene content actually present.
    assert set(np.unique(np.asarray(a.segmask))) == {-1, 0, 1}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parity_random_scenes(seed):
    """Fuzz: random triangles/instances/cameras — outputs must match
    exactly between the kernel and the jnp reference."""
    rng = np.random.default_rng(seed)
    n_meshes = int(rng.integers(1, 4))
    meshes = [
        (rng.normal(size=(int(rng.integers(1, 7)) * 3, 3)) * 5).astype(np.float32)
        for _ in range(n_meshes)
    ]
    instances = [
        ImportedInstance(
            position=rng.normal(size=3).tolist(),
            rotation=(lambda q: (q / np.linalg.norm(q)).tolist())(rng.normal(size=4)),
            scale=rng.uniform(0.5, 2.0, size=3).tolist(),
            object_id=int(rng.integers(0, n_meshes)),
        )
        for _ in range(int(rng.integers(1, 5)))
    ]
    cameras = [
        ImportedCamera(
            position=(rng.normal(size=3) * 3 + [0, -12, 0]).tolist(),
            rotation=(lambda q: (q / np.linalg.norm(q)).tolist())(
                rng.normal(size=4) * 0.2 + [1, 0, 0, 0]
            ),
        )
        for _ in range(int(rng.integers(1, 3)))
    ]
    state, scene = build(meshes, instances, cameras)
    a = rt_ref(state, scene, height=32, width=32)
    b = rt_pal(state, scene, height=32, width=32, interpret=True)
    _assert_frames_equal(a, b)


def test_parity_cluster_culled_large_mesh():
    """Cluster-culled kernel must match brute force exactly on a mesh big
    enough to span many clusters (random triangle cloud + occluder wall)."""
    rng = np.random.default_rng(7)
    n_tris = 300
    centers = rng.uniform(-8, 8, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(5, 30, size=n_tris)  # in front of camera
    tris = []
    for c in centers:
        a = c + rng.normal(size=3) * 0.5
        b = c + rng.normal(size=3) * 0.5
        d = c + rng.normal(size=3) * 0.5
        tris += [a, b, d]
    mesh = np.asarray(tris, np.float32)
    state, scene = build(
        [mesh, quad_xz(half=50.0, y=0.0)],
        [
            ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0),
            ImportedInstance(position=[0, 35, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=1),
        ],
        [cam_at_origin_looking_plus_y()],
    )
    ref = rt_ref(state, scene, height=32, width=32)
    culled = rt_pal(state, scene, height=32, width=32, interpret=True, accel="clusters")
    brute = rt_pal(state, scene, height=32, width=32, interpret=True, accel="none")
    _assert_frames_equal(ref, culled)
    _assert_frames_equal(ref, brute)
    # Scene sanity: both objects visible.
    assert set(np.unique(np.asarray(ref.segmask))) >= {0, 1}


def test_parity_textured_bilinear(tmp_path):
    """Textured scene exercises the non-shaded kernel + planar bilinear
    sampling; must match the jnp reference within ±1 LSB."""
    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial

    from tests.fixtures import make_checker_png
    from tests.helpers import quad_uvs

    path = str(tmp_path / "checker.png")
    write_png(path, make_checker_png(16, 4))
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
        uvs=[quad_uvs()],
        mesh_materials=[0],
        additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0)],
        additional_textures=[path],
    )
    for filt in ("nearest", "bilinear"):
        a = rt_ref(state, scene, height=32, width=32, texture_filter=filt)
        b = rt_pal(state, scene, height=32, width=32, interpret=True, texture_filter=filt)
        diff = np.abs(
            np.asarray(a.rgb).astype(np.int16) - np.asarray(b.rgb).astype(np.int16)
        )
        assert diff.max() <= 1, (filt, diff.max())
    # Bilinear really differs from nearest (filtering happens).
    n = rt_pal(state, scene, height=32, width=32, interpret=True, texture_filter="nearest")
    bl = rt_pal(state, scene, height=32, width=32, interpret=True, texture_filter="bilinear")
    assert (np.asarray(n.rgb) != np.asarray(bl.rgb)).any()


def test_parity_dma_streamed_large_mesh():
    """Meshes whose triangle SoA exceeds the SMEM budget stream clusters
    via DMA — exact parity with the jnp reference (interpret mode)."""
    rng = np.random.default_rng(11)
    n_tris = 3600  # 29 rows * 3600 * 4B ≈ 418 KB > 384 KB threshold
    centers = rng.uniform(-10, 10, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 40, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    state, scene = build(
        [tris],
        [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
    )
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    S = state.instance_obj.shape[1] * scene.tris_per_object
    assert rp._N_TRI_ROWS * S * 4 > 384 * 1024, "test no longer triggers DMA"
    ref = rt_ref(state, scene, height=16, width=16)
    dma = rt_pal(state, scene, height=16, width=16, interpret=True, accel="clusters")
    _assert_frames_equal(ref, dma)
    assert (np.asarray(ref.segmask) >= 0).any()
    # accel='none' at this size must refuse (SMEM budget).
    with pytest.raises(ValueError, match="SMEM budget"):
        rt_pal(state, scene, height=16, width=16, interpret=True, accel="none")


def test_parity_dma_multi_instance_small_clusters():
    """Many instances of a medium object: the per-object block fits SMEM
    (cluster_size < 128) but the soup forces the DMA path — exercises the
    128-aligned window covering sub-128 clusters (off ∈ {0, 64, ...})."""
    rng = np.random.default_rng(13)
    n_tris = 500  # t_pad 512, cluster_size 64
    centers = rng.uniform(-6, 6, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 25, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.5
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.5
    instances = [
        ImportedInstance(
            position=[(i % 8 - 3.5) * 2, 0, (i // 8 - 3.5) * 2],
            rotation=[1, 0, 0, 0], scale=[0.5, 0.5, 0.5], object_id=0,
        )
        for i in range(64)
    ]
    state, scene = build([tris], instances, [cam_at_origin_looking_plus_y()])
    from madrona_renderer_tpu.ops import raytrace_pallas as rp
    from madrona_renderer_tpu.core.scene import SMEM_TRI_BUDGET

    S = state.instance_obj.shape[1] * scene.tris_per_object
    cs = scene.tris_per_object // scene.cl_valid.shape[1]
    assert rp._N_TRI_ROWS * S * 4 > SMEM_TRI_BUDGET, "must trigger DMA"
    assert cs < 128, f"must exercise sub-128 clusters (got {cs})"
    ref = rt_ref(state, scene, height=16, width=16)
    dma = rt_pal(state, scene, height=16, width=16, interpret=True, accel="clusters")
    _assert_frames_equal(ref, dma)
    assert (np.asarray(ref.segmask) >= 0).any()


def test_parity_nonaligned_resolution():
    """Resolutions whose pixel count is not a multiple of the 1024-pixel
    tile exercise the padding path."""
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
    )
    a = rt_ref(state, scene, height=24, width=24)  # 576 px: pads to 1024
    b = rt_pal(state, scene, height=24, width=24, interpret=True)
    _assert_frames_equal(a, b)


def test_parity_per_camera_fov_znear():
    """Heterogeneous per-view fov/znear: pallas kernel == jnp reference."""
    import dataclasses

    import jax.numpy as jnp

    from tests.helpers import quad_xz

    state, scene = build(
        [quad_xz(half=8.0, y=0.0)],
        [
            ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0], object_id=0),
            ImportedInstance(position=[1, 4, 1], rotation=[1, 0, 0, 0],
                             scale=[0.2, 1, 0.2], object_id=0),
        ],
        [
            ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0]),
            ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                           fov_y_degrees=45.0, znear=5.0),
            ImportedCamera(position=[0, -3, 0], rotation=[1, 0, 0, 0],
                           fov_y_degrees=120.0),
        ],
    )
    assert float(jnp.max(state.camera_fov)) == 120.0  # plumbed through ECS
    a = rt_ref(state, scene, height=48, width=64)
    b = rt_pal(state, scene, height=48, width=64, interpret=True)
    _assert_frames_equal(a, b)

    from madrona_renderer_tpu.ops.raster_pallas import rasterize as rast_pal
    from madrona_renderer_tpu.ops.raster_ref import rasterize as rast_ref

    # Raster mode: znear is camera-plane; exercise the t-space bound too.
    state2 = dataclasses.replace(
        state, camera_znear=jnp.array([[0.0, 2.0, 0.5]], jnp.float32)
    )
    a = rast_ref(state2, scene, height=48, width=64)
    b = rast_pal(state2, scene, height=48, width=64, interpret=True)
    rgb_a = np.asarray(a.rgb).astype(np.int16)
    rgb_b = np.asarray(b.rgb).astype(np.int16)
    assert np.abs(rgb_a - rgb_b).max() <= 1
    np.testing.assert_allclose(
        np.asarray(a.depth), np.asarray(b.depth), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parity_mxu_random_scenes(seed):
    """Fuzz the batched (MXU) kernel against the jnp reference — same
    scene generator as the scalar-kernel fuzz."""
    rng = np.random.default_rng(1000 + seed)
    n_meshes = int(rng.integers(1, 4))
    meshes = [
        (rng.normal(size=(int(rng.integers(1, 7)) * 3, 3)) * 5).astype(np.float32)
        for _ in range(n_meshes)
    ]
    instances = [
        ImportedInstance(
            position=rng.normal(size=3).tolist(),
            rotation=(lambda q: (q / np.linalg.norm(q)).tolist())(rng.normal(size=4)),
            scale=rng.uniform(0.5, 2.0, size=3).tolist(),
            object_id=int(rng.integers(0, n_meshes)),
        )
        for _ in range(int(rng.integers(1, 5)))
    ]
    cameras = [
        ImportedCamera(
            position=(rng.normal(size=3) * 3 + [0, -12, 0]).tolist(),
            rotation=(lambda q: (q / np.linalg.norm(q)).tolist())(
                rng.normal(size=4) * 0.2 + [1, 0, 0, 0]
            ),
        )
        for _ in range(int(rng.integers(1, 3)))
    ]
    state, scene = build(meshes, instances, cameras)
    a = rt_ref(state, scene, height=32, width=32)
    b = rt_pal(state, scene, height=32, width=32, interpret=True, accel="mxu")
    _assert_frames_equal(a, b)


def test_parity_mxu_multichunk_and_modes():
    """MXU kernel with >1 triangle chunk (S_pad > k_chunk exercises the
    chunk carry/merge), non-aligned resolution, textured scene (unshaded
    variant), raster mode, and heterogeneous per-camera fov/znear."""
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    # 300 triangles → S_pad 384 with k_chunk 128 → 3 chunks.
    centers = rng.uniform(-8, 8, size=(300, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(5, 30, size=300)
    tris = []
    for c in centers:
        tris += [c + rng.normal(size=3) * 0.5 for _ in range(3)]
    mesh = np.asarray(tris, np.float32)
    state, scene = build(
        [mesh, quad_xz(half=50.0, y=0.0)],
        [
            ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0], object_id=0),
            ImportedInstance(position=[0, 35, 0], rotation=[1, 0, 0, 0], object_id=1),
        ],
        [
            cam_at_origin_looking_plus_y(),
            ImportedCamera(position=[0, -5, 2], rotation=[1, 0, 0, 0],
                           fov_y_degrees=60.0, znear=2.0),
        ],
    )
    a = rt_ref(state, scene, height=24, width=40)
    b = rt_pal(state, scene, height=24, width=40, interpret=True, accel="mxu")
    _assert_frames_equal(a, b)

    from madrona_renderer_tpu.ops.raster_pallas import rasterize as rast_pal
    from madrona_renderer_tpu.ops.raster_ref import rasterize as rast_ref

    a = rast_ref(state, scene, height=24, width=40)
    b = rast_pal(state, scene, height=24, width=40, interpret=True, accel="mxu")
    rgb_a = np.asarray(a.rgb).astype(np.int16)
    rgb_b = np.asarray(b.rgb).astype(np.int16)
    assert np.abs(rgb_a - rgb_b).max() <= 1
    np.testing.assert_allclose(
        np.asarray(a.depth), np.asarray(b.depth), rtol=1e-5, atol=1e-5
    )


def test_parity_mxu_textured():
    """Textured scene drives the unshaded (9-output) variant of the MXU
    kernel: uv/mat/normal outputs must match the reference epilogue."""
    import os

    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial

    from tests.fixtures import make_checker_png
    from tests.helpers import quad_uvs

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tex = os.path.join(td, "checker.png")
        write_png(tex, make_checker_png())
        state, scene = build(
            [quad_xz(half=20.0, y=0.0)],
            [ImportedInstance(position=[0, 15, 0], rotation=[1, 0, 0, 0], object_id=0)],
            [cam_at_origin_looking_plus_y()],
            uvs=[quad_uvs()],
            mesh_materials=[0],
            additional_mats=[AdditionalMaterial(color=[1, 1, 1, 1], texture_id=0)],
            additional_textures=[tex],
        )
        a = rt_ref(state, scene, height=32, width=32)
        b = rt_pal(state, scene, height=32, width=32, interpret=True, accel="mxu")
        _assert_frames_equal(a, b)


def test_parity_textured_inkernel_mixed_materials(tmp_path):
    """The in-kernel nearest-texture path (round 2: mp/pool lane-gathers +
    u32 texel pool + k/255 dequant LUT) on a scene mixing textured and
    untextured materials — must match the jnp reference exactly, including
    the white-texel no-op for the untextured material."""
    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial

    from tests.fixtures import make_checker_png
    from tests.helpers import quad_uvs

    path = str(tmp_path / "checker.png")
    write_png(path, make_checker_png(32, 8))
    # Two quads side by side: one textured, one plain-colored.
    state, scene = build(
        [quad_xz(half=6.0, y=0.0), quad_xz(half=6.0, y=0.0)],
        [
            ImportedInstance(position=[-7, 14, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=0),
            ImportedInstance(position=[7, 14, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=1),
        ],
        [cam_at_origin_looking_plus_y()],
        uvs=[quad_uvs(), quad_uvs()],
        mesh_materials=[0, 1],
        additional_mats=[
            AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0),
            AdditionalMaterial(color=(0.2, 0.9, 0.4, 1), texture_id=-1),
        ],
        additional_textures=[path],
    )
    a = rt_ref(state, scene, height=48, width=48)
    b = rt_pal(state, scene, height=48, width=48, interpret=True)
    _assert_frames_equal(a, b)
    # Sanity: the in-kernel gate is actually on for this pool size.
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    assert scene.tex_data.shape[0] <= rp._TEX_INKERNEL_MAX_ROWS * rp._TILE_LANE


def test_parity_textured_big_pool_fallback(tmp_path):
    """Texel pools beyond the in-kernel budget fall back to the planar XLA
    epilogue — same results, just a different execution path."""
    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial

    from tests.fixtures import make_checker_png
    from tests.helpers import quad_uvs

    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    # 144x144 = 20,736 texels > the 16,384-texel in-kernel cap.
    path = str(tmp_path / "big.png")
    write_png(path, make_checker_png(144, 16))
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
        uvs=[quad_uvs()],
        mesh_materials=[0],
        additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0)],
        additional_textures=[path],
    )
    assert scene.tex_data.shape[0] > rp._TEX_INKERNEL_MAX_ROWS * rp._TILE_LANE
    a = rt_ref(state, scene, height=32, width=32)
    b = rt_pal(state, scene, height=32, width=32, interpret=True)
    _assert_frames_equal(a, b)


@pytest.mark.parametrize("seed", [3, 17])
def test_parity_binned_random_scenes(seed):
    """The tile-binned pass (accel='binned': screen-space band bins built
    per step by band_cluster_bins) must match the jnp reference on random
    scenes — same per-pixel math, the bins only restrict which clusters a
    band sweeps. Uses a multi-band image (height > one band) so binning is
    real."""
    rng = np.random.default_rng(seed)
    meshes = [
        (rng.normal(size=(int(rng.integers(4, 9)) * 3, 3)) * 5).astype(np.float32)
        for _ in range(2)
    ]
    instances = [
        ImportedInstance(
            position=rng.normal(size=3).tolist(),
            rotation=(lambda q: (q / np.linalg.norm(q)).tolist())(rng.normal(size=4)),
            scale=rng.uniform(0.5, 2.0, size=3).tolist(),
            object_id=int(rng.integers(0, 2)),
        )
        for _ in range(4)
    ]
    cameras = [
        ImportedCamera(
            position=(rng.normal(size=3) * 3 + [0, -12, 0]).tolist(),
            rotation=(lambda q: (q / np.linalg.norm(q)).tolist())(
                rng.normal(size=4) * 0.2 + [1, 0, 0, 0]
            ),
        )
    ]
    state, scene = build(meshes, instances, cameras)
    # 64x48: P = 3072 -> tile_sub 16, 2 bands.
    a = rt_ref(state, scene, height=48, width=64)
    b = rt_pal(state, scene, height=48, width=64, interpret=True, accel="binned")
    _assert_frames_equal(a, b)
    # Raster conventions over the binned pass too.
    from madrona_renderer_tpu.ops.raster_ref import rasterize as rast_ref
    from madrona_renderer_tpu.ops.raytrace_pallas import rasterize as rast_pal

    ar = rast_ref(state, scene, height=48, width=64)
    br = rast_pal(state, scene, height=48, width=64, interpret=True, accel="binned")
    _assert_frames_equal(ar, br)


def test_parity_binned_dma_large_mesh():
    """binned + DMA-streamed triangles together (the big-mesh raster
    configuration): parity on a mesh past the SMEM budget, multi-band."""
    rng = np.random.default_rng(23)
    n_tris = 3600
    centers = rng.uniform(-10, 10, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 40, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    state, scene = build(
        [tris],
        [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
    )
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    S = state.instance_obj.shape[1] * scene.tris_per_object
    assert rp._N_TRI_ROWS * S * 4 > 384 * 1024, "test no longer triggers DMA"
    ref = rt_ref(state, scene, height=32, width=64)  # P=2048: 2 bands
    binned = rt_pal(state, scene, height=32, width=64, interpret=True, accel="binned")
    _assert_frames_equal(ref, binned)
    assert (np.asarray(ref.segmask) >= 0).any()


def test_parity_2d_tiles_wide_image():
    """Images ≥ 256 px wide use 2D screen tiles (tile_sub × 128
    rectangles) with 2D row×column bins — exact parity incl. the
    reassembly transpose in unpack (round-3 large-mesh accelerator)."""
    rng = np.random.default_rng(21)
    n_tris = 800
    centers = rng.uniform(-12, 12, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(3, 30, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.5
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.5
    state, scene = build(
        [tris],
        [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
    )
    ref = rt_ref(state, scene, height=96, width=256)
    for accel in ("clusters", "binned"):
        pal = rt_pal(state, scene, height=96, width=256, interpret=True,
                     accel=accel)
        _assert_frames_equal(ref, pal)
    assert (np.asarray(ref.segmask) >= 0).any()


def test_parity_occlusion_early_exit():
    """A full-view near quad occluding a dense far field: the
    front-to-back sweep's occlusion early-exit must skip the far
    clusters without changing a single pixel."""
    rng = np.random.default_rng(23)
    n_tris = 600
    centers = rng.uniform(-30, 30, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(50, 90, size=n_tris)  # far field
    far_tris = np.repeat(centers, 3, axis=0)
    far_tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32)
    far_tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32)
    state, scene = build(
        [quad_xz(half=100.0, y=0.0), far_tris],
        [
            ImportedInstance(position=[0, 5, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=0),  # near occluder
            ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=1),
        ],
        [cam_at_origin_looking_plus_y()],
    )
    ref = rt_ref(state, scene, height=64, width=256)
    # Everything hits the near quad (full coverage, exercising the exit).
    assert (np.asarray(ref.segmask) == 0).all()
    for accel in ("clusters", "binned"):
        pal = rt_pal(state, scene, height=64, width=256, interpret=True,
                     accel=accel)
        _assert_frames_equal(ref, pal)


def test_parity_deferred_heterogeneous_worlds():
    """Deferred binned path with per-world instance validity: world 0
    has both instances, world 1 only the first — invalid instances'
    clusters must vanish from bins and sweeps identically to the ref."""
    rng = np.random.default_rng(41)
    n_tris = 3600
    centers = rng.uniform(-10, 10, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 40, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    instances = [
        ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                         scale=[1, 1, 1], object_id=0),
        ImportedInstance(position=[3, 5, 0], rotation=[1, 0, 0, 0],
                         scale=[0.5, 0.5, 0.5], object_id=0),
    ]
    cams = [cam_at_origin_looking_plus_y(), cam_at_origin_looking_plus_y()]
    worlds = [
        WorldInit(num_instances=2, instance_offset=0, num_cameras=1,
                  camera_offset=0),
        WorldInit(num_instances=1, instance_offset=0, num_cameras=1,
                  camera_offset=1),
    ]
    state, scene = build([tris], instances, cams, worlds=worlds)
    from madrona_renderer_tpu.core.scene import SMEM_TRI_BUDGET
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    S = state.instance_obj.shape[1] * scene.tris_per_object
    assert rp._N_TRI_ROWS * S * 4 > SMEM_TRI_BUDGET, "must trigger DMA"
    ref = rt_ref(state, scene, height=16, width=16)
    pal = rt_pal(state, scene, height=16, width=16, interpret=True,
                 accel="binned")
    _assert_frames_equal(ref, pal)
    # World 1 must not see instance 1.
    assert (np.asarray(ref.segmask)[1] != 1).all()


def test_parity_deferred_multi_camera():
    """Deferred path with 2 cameras per world: the DMA source row is the
    WORLD index (program id // num_cams) — both views must match ref."""
    rng = np.random.default_rng(43)
    n_tris = 3600
    centers = rng.uniform(-10, 10, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 40, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    cams = [
        cam_at_origin_looking_plus_y(),
        ImportedCamera(position=[5, -2, 1], rotation=[0.96, 0, 0, 0.28]),
    ]
    state, scene = build(
        [tris],
        [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        cams,
        worlds=[WorldInit(num_instances=1, instance_offset=0,
                          num_cameras=2, camera_offset=0)],
    )
    ref = rt_ref(state, scene, height=16, width=16)
    pal = rt_pal(state, scene, height=16, width=16, interpret=True,
                 accel="binned")
    _assert_frames_equal(ref, pal)
    # The two views genuinely differ.
    assert (np.asarray(ref.rgb)[:, 0] != np.asarray(ref.rgb)[:, 1]).any()


def _dense_field_scene(seed=41, n_tris=3600, two_instances=True):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, size=(n_tris, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(4, 40, size=n_tris)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    instances = [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                                  scale=[1, 1, 1], object_id=0)]
    if two_instances:
        instances.append(
            ImportedInstance(position=[3, 5, 0], rotation=[1, 0, 0, 0],
                             scale=[0.5, 0.5, 0.5], object_id=0))
    return build([tris], instances, [cam_at_origin_looking_plus_y()])


def test_parity_deferred_mxu(monkeypatch):
    """Deferred-MXU sweep (MRT_DEFERRED_MXU=1): the per-cluster matmul
    intersection must match the jnp reference exactly in interpret mode
    (dot_general is a plain f32 dot there — the iota-min tie-break and
    strict-< cluster merge are what is under test)."""
    monkeypatch.setenv("MRT_DEFERRED_MXU", "1")
    state, scene = _dense_field_scene()
    from madrona_renderer_tpu.core.scene import SMEM_TRI_BUDGET
    from madrona_renderer_tpu.ops import raytrace_pallas as rp

    S = state.instance_obj.shape[1] * scene.tris_per_object
    assert rp._N_TRI_ROWS * S * 4 > SMEM_TRI_BUDGET, "must trigger DMA"
    ref = rt_ref(state, scene, height=16, width=16)
    pal = rt_pal(state, scene, height=16, width=16, interpret=True,
                 accel="binned")
    _assert_frames_equal(ref, pal)
    assert (np.asarray(ref.segmask) >= 0).any()


def test_parity_deferred_mxu_ordered(monkeypatch):
    """Deferred-MXU through the ordered (non-binned) visit path, single
    instance — covers the perm_ref cluster_at variant and partial
    (cnt < cluster_size) tail clusters."""
    monkeypatch.setenv("MRT_DEFERRED_MXU", "1")
    state, scene = _dense_field_scene(seed=47, two_instances=False)
    ref = rt_ref(state, scene, height=16, width=16)
    pal = rt_pal(state, scene, height=16, width=16, interpret=True,
                 accel="clusters")
    _assert_frames_equal(ref, pal)


def test_parity_deferred_mxu_matches_scalar(monkeypatch):
    """The dmxu sweep and the scalar deferred sweep are exact-equal in
    interpret mode (same formulas, same tie-breaks)."""
    state, scene = _dense_field_scene(seed=53)
    a = rt_pal(state, scene, height=16, width=16, interpret=True,
               accel="binned")
    monkeypatch.setenv("MRT_DEFERRED_MXU", "1")
    b = rt_pal(state, scene, height=16, width=16, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))


def test_parity_deferred_mxu_rowskip(monkeypatch):
    """Scanline-banded dmxu sweep (2D tiles: 64x256 -> tiles_x=2): rows
    outside a cluster's projected span are skipped — must be invisible
    (the host projection is conservative), exact vs the reference, and
    exact vs the unskipped dmxu sweep."""
    monkeypatch.setenv("MRT_DEFERRED_MXU", "1")
    state, scene = _dense_field_scene(seed=59)
    ref = rt_ref(state, scene, height=64, width=256)
    pal = rt_pal(state, scene, height=64, width=256, interpret=True,
                 accel="binned")
    _assert_frames_equal(ref, pal)
    monkeypatch.setenv("MRT_ROWSKIP", "0")
    pal2 = rt_pal(state, scene, height=64, width=256, interpret=True,
                  accel="binned")
    np.testing.assert_array_equal(np.asarray(pal.rgb), np.asarray(pal2.rgb))
    np.testing.assert_array_equal(np.asarray(pal.segmask),
                                  np.asarray(pal2.segmask))


def test_parity_prep_stream_matches_raw(monkeypatch):
    """Prep-streamed deferred sweep (pack-time D/A/Q/t_num rows,
    MRT_PREP_STREAM) vs the raw-geometry stream: the streamed constants
    are computed with term-for-term the same f32 expressions the kernel
    used in-loop, so the two must be exactly equal in interpret mode."""
    state, scene = _dense_field_scene(seed=61)
    a = rt_pal(state, scene, height=16, width=16, interpret=True,
               accel="binned")
    monkeypatch.setenv("MRT_PREP_STREAM", "0")
    b = rt_pal(state, scene, height=16, width=16, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))


def test_parity_prep_resident_matches_raw(monkeypatch):
    """Resident prep twin (MRT_PREP_RESIDENT): the defer_attrs sweep with
    pack-time constants (dot-with-scalars numerators) vs the pvec-form
    raw-geometry sweep. These use DIFFERENT factorizations, so the
    contract is reference parity for both plus near-equality between
    them, not bitwise equality."""
    state, scene = build(
        [quad_xz(half=100.0, y=0.0)],
        [
            ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                             scale=[1, 1, 1], object_id=0),
            ImportedInstance(position=[0, 5, 0], rotation=[1, 0, 0, 0],
                             scale=[0.05, 1, 0.05], object_id=0),
        ],
        [cam_at_origin_looking_plus_y()],
    )
    ref = rt_ref(state, scene, height=64, width=64)
    a = rt_pal(state, scene, height=64, width=64, interpret=True)
    _assert_frames_equal(ref, a)
    monkeypatch.setenv("MRT_PREP_RESIDENT", "0")
    b = rt_pal(state, scene, height=64, width=64, interpret=True)
    _assert_frames_equal(ref, b)
    _assert_frames_equal(a, b)


def test_parity_banded_deferred_matches_unbanded(monkeypatch):
    """MRT_SWEEP_BANDS splits the deferred sweep into row bands with
    per-band slab gates; per-pixel arithmetic is unchanged, so banded
    and unbanded traces must be exactly equal (and both match ref)."""
    state, scene = _dense_field_scene(seed=67)
    ref = rt_ref(state, scene, height=64, width=256)
    a = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    monkeypatch.setenv("MRT_SWEEP_BANDS", "4")
    b = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))


@pytest.mark.parametrize("rps", [2, 4])
def test_parity_tall_tiles(monkeypatch, rps):
    """Tall tiles (MRT_TILE_RPS): tile_rps image rows per sublane, so a
    2D tile covers (32·rps) rows × (128/rps) columns. The per-pixel
    arithmetic is mapping-agnostic — only raygen, binning rects, band
    row-gates, and the output unflatten change — so tall-tile, classic,
    and reference traces must be exactly equal, including with a cropped
    bottom tile and the banded scalar-gated sweep."""
    state, scene = _dense_field_scene(seed=79)
    ref = rt_ref(state, scene, height=48, width=256)
    a = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    monkeypatch.setenv("MRT_TILE_RPS", str(rps))
    monkeypatch.setenv("MRT_SWEEP_BANDS", "4")
    b = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))
    # Resident (SMEM) cluster path through the same tall-tile mapping.
    state_r, scene_r = _dense_field_scene(seed=83, n_tris=400)
    ref_r = rt_ref(state_r, scene_r, height=48, width=256)
    c = rt_pal(state_r, scene_r, height=48, width=256, interpret=True)
    _assert_frames_equal(ref_r, c)


@pytest.mark.parametrize("bands", [2, 8])
def test_parity_band_gates_flattened_tiles(monkeypatch, bands):
    """Scalar band gates on flattened-band tiles (width 64 → tiles_x = 1,
    each sublane = two whole image rows) with a cropped last tile
    (height 48 → 1024 padding pixels): scalar-gated, vector-gated, and
    reference traces must be exactly equal."""
    state, scene = _dense_field_scene(seed=73)
    ref = rt_ref(state, scene, height=48, width=64)
    monkeypatch.setenv("MRT_SWEEP_BANDS", str(bands))
    a = rt_pal(state, scene, height=48, width=64, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    monkeypatch.setenv("MRT_BAND_GATES", "0")
    b = rt_pal(state, scene, height=48, width=64, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))


@pytest.mark.parametrize("bands", [2, 8])
def test_parity_band_gates_match_vector_gates(monkeypatch, bands):
    """MRT_BAND_GATES swaps the banded sweep's per-(cluster, band) vector
    slab tests + any() occlusion checks for scalar gates (pack-time row
    spans + carried occlusion bounds). Both gate sets are conservative
    supersets of the true contributor set and the per-pixel arithmetic is
    identical, so scalar-gated, vector-gated, and reference traces must
    all be exactly equal — including at a non-multiple-of-32 height
    (cropped bottom tile) and 2D tiles (width 256 → tiles_x = 2)."""
    state, scene = _dense_field_scene(seed=71)
    ref = rt_ref(state, scene, height=48, width=256)
    monkeypatch.setenv("MRT_SWEEP_BANDS", str(bands))
    a = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    monkeypatch.setenv("MRT_BAND_GATES", "0")
    b = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))


def test_parity_camera_inside_scene_straddle_bins(monkeypatch):
    """Frustum-plane binning with the camera INSIDE the scene's AABB:
    many clusters straddle the camera plane (corners both in front and
    behind). Their projection is unbounded — the old binning put them
    in every tile, the plane tests keep only the tiles their in-front
    part can reach — and correctness demands the bins stay conservative:
    the binned trace must equal the reference exactly, through both the
    vector- and scalar-gated banded sweeps (straddlers also exercise
    the plane-hull row spans in camera_cluster_rowspans)."""
    rng = np.random.default_rng(89)
    n_tris = 3600
    centers = rng.uniform(-25, 25, size=(n_tris, 3)).astype(np.float32)
    tris = np.repeat(centers, 3, axis=0)
    tris[1::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.5
    tris[2::3] += rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.5
    instances = [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                                  scale=[1, 1, 1], object_id=0)]
    state, scene = build([tris], instances,
                         [cam_at_origin_looking_plus_y()])
    ref = rt_ref(state, scene, height=48, width=256)
    a = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    assert (np.asarray(ref.segmask) >= 0).any()
    monkeypatch.setenv("MRT_SWEEP_BANDS", "4")
    b = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    monkeypatch.setenv("MRT_BAND_GATES", "0")
    c = rt_pal(state, scene, height=48, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(c.rgb))


def test_parity_tri_ranges_knobs(monkeypatch):
    """Per-band triangle ranges (MRT_TRI_RANGES): clusters' triangles are
    row-sorted at pack time and each band sweeps only its sub-range.
    Ranges are conservative and the original-index tie-break reproduces
    the reference's argmin on exact ties, so ranged, unranged, tie-less,
    and reference traces must all be exactly equal — including at 4
    bands (two packed range words per bin entry) and unroll 1."""
    state, scene = _dense_field_scene(seed=97)
    ref = rt_ref(state, scene, height=64, width=256)
    a = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    for env in [{"MRT_TRI_RANGES": "0"}, {"MRT_TRI_TIE": "0"},
                {"MRT_SWEEP_BANDS": "4"},
                {"MRT_SWEEP_BANDS": "4", "MRT_SWEEP_UNROLL": "1"}]:
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        b = rt_pal(state, scene, height=64, width=256, interpret=True,
                   accel="binned")
        np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
        np.testing.assert_array_equal(np.asarray(a.depth),
                                      np.asarray(b.depth))
        np.testing.assert_array_equal(np.asarray(a.segmask),
                                      np.asarray(b.segmask))
        for k in env:
            monkeypatch.delenv(k)


def test_parity_tri_ranges_coplanar_shared_edge():
    """Row-sorting flips the visit order of two coplanar triangles that
    share an edge (the classic exact-t tie shape — a split flat quad).
    The ranged sweep's original-index tie-break must keep the kernel
    bitwise equal to the reference's argmin through the textured
    deferred path."""
    import os
    import tempfile

    from madrona_renderer_tpu.assets.png import write_png
    from tests.fixtures import make_checker_png

    rng = np.random.default_rng(5)
    quad = np.asarray([
        [-4, 10, 0], [4, 10, 0], [0, 10, -4],   # below the shared edge
        [-4, 10, 0], [4, 10, 0], [0, 10, 4],    # above (sorts first)
    ], np.float32)
    uv = np.asarray([
        [0, 0.5], [1, 0.5], [0.5, 0.0],
        [0, 0.5], [1, 0.5], [0.5, 1.0],
    ], np.float32)
    centers = rng.uniform(-10, 10, size=(3600, 3)).astype(np.float32)
    centers[:, 1] = rng.uniform(20, 40, size=3600)
    fill = np.repeat(centers, 3, axis=0)
    fill[1::3] += rng.normal(size=(3600, 3)).astype(np.float32) * 0.4
    fill[2::3] += rng.normal(size=(3600, 3)).astype(np.float32) * 0.4
    tris = np.concatenate([quad, fill], 0)
    uvs = np.concatenate([uv, np.zeros((fill.shape[0], 2), np.float32)], 0)
    with tempfile.TemporaryDirectory() as td:
        tex = os.path.join(td, "checker.png")
        write_png(tex, make_checker_png())
        state, scene = build(
            [tris],
            [ImportedInstance(position=[0, 0, 0], rotation=[1, 0, 0, 0],
                              scale=[1, 1, 1], object_id=0)],
            [cam_at_origin_looking_plus_y()],
            uvs=[uvs], mesh_materials=[0],
            additional_mats=[AdditionalMaterial(color=[1, 1, 1, 1],
                                                texture_id=0)],
            additional_textures=[tex],
        )
        ref = rt_ref(state, scene, height=64, width=256)
        a = rt_pal(state, scene, height=64, width=256, interpret=True,
                   accel="binned")
        _assert_frames_equal(ref, a)
        assert (np.asarray(ref.segmask) >= 0).any()


def test_parity_window_coherent_order(monkeypatch):
    """MRT_WIN_SORT bucket-sorts each bin by (pow2 distance bucket, DMA
    window) so same-window clusters visit back-to-back; the kernel keeps
    a tight per-cluster visit gate and keys its early-exit on the
    half-bucket floor. Visit order is an implementation detail — the
    bucketed, exact-sorted, and reference traces must be exactly equal
    (the ranged sweep's original-index tie-break makes even exact-t
    ties order-independent), banded and unbanded."""
    state, scene = _dense_field_scene(seed=101)
    ref = rt_ref(state, scene, height=64, width=256)
    a = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    _assert_frames_equal(ref, a)
    monkeypatch.setenv("MRT_WIN_SORT", "1")
    b = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.segmask),
                                  np.asarray(b.segmask))
    monkeypatch.setenv("MRT_SWEEP_BANDS", "1")
    c = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    monkeypatch.setenv("MRT_WIN_SORT", "0")
    d = rt_pal(state, scene, height=64, width=256, interpret=True,
               accel="binned")
    np.testing.assert_array_equal(np.asarray(c.rgb), np.asarray(d.rgb))


def test_parity_uv_defer_knob(monkeypatch):
    """MRT_UV_DEFER drops the resident defer_attrs sweep's (u, v)
    carries; the resolve recomputes the winner's barycentrics from prep
    rows mirrored in the VMEM attr block with the sweep's exact
    arithmetic. Both settings must equal each other and the reference —
    textured so interpolated UVs are observable."""
    import os
    import tempfile

    from madrona_renderer_tpu.assets.png import write_png
    from tests.fixtures import make_checker_png
    from tests.helpers import quad_uvs

    with tempfile.TemporaryDirectory() as td:
        tex = os.path.join(td, "checker.png")
        write_png(tex, make_checker_png())
        state, scene = build(
            [quad_xz(half=20.0, y=0.0)],
            [ImportedInstance(position=[0, 15, 0], rotation=[1, 0, 0, 0],
                              object_id=0)],
            [cam_at_origin_looking_plus_y()],
            uvs=[quad_uvs()], mesh_materials=[0],
            additional_mats=[AdditionalMaterial(color=[1, 1, 1, 1],
                                                texture_id=0)],
            additional_textures=[tex],
        )
        ref = rt_ref(state, scene, height=32, width=32)
        a = rt_pal(state, scene, height=32, width=32, interpret=True)
        _assert_frames_equal(ref, a)
        monkeypatch.setenv("MRT_UV_DEFER", "0")
        b = rt_pal(state, scene, height=32, width=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
        np.testing.assert_array_equal(np.asarray(a.depth),
                                      np.asarray(b.depth))


def _eight_world_scene(seed=131):
    """8 worlds with per-world DISTINCT instances and cameras: the
    supertile world-fold (wpp > 1) indexes sub-worlds inside one grid
    program, so identical worlds would mask any indexing bug."""
    rng = np.random.default_rng(seed)
    insts, cams, worlds = [], [], []
    for w in range(8):
        insts.append(ImportedInstance(
            position=[float(rng.uniform(-3, 3)),
                      float(10 + 2 * w),
                      float(rng.uniform(-3, 3))],
            rotation=[1, 0, 0, 0],
            scale=[1 + 0.2 * w, 1, 1 + 0.1 * w],
            object_id=0,
        ))
        cams.append(cam_at_origin_looking_plus_y())
        worlds.append(WorldInit(num_instances=1, instance_offset=w,
                                num_cameras=1, camera_offset=w))
    return build([quad_xz(half=30.0, y=0.0)], insts, cams, worlds)


def _multicam_scene(n_worlds, n_cams, seed=137):
    """n_worlds × n_cams with per-world DISTINCT instances and per-CAMERA
    distinct poses: the camera fold (wpp spanning camera-slots) slices
    camera-major refs by wi and world-major refs by wi // C inside one
    grid program, so identical cameras or worlds would mask a mixed-up
    sub-index."""
    rng = np.random.default_rng(seed)
    insts, cams, worlds = [], [], []
    for w in range(n_worlds):
        insts.append(ImportedInstance(
            position=[float(rng.uniform(-3, 3)),
                      float(10 + 2 * w),
                      float(rng.uniform(-3, 3))],
            rotation=[1, 0, 0, 0],
            scale=[1 + 0.2 * w, 1, 1 + 0.1 * w],
            object_id=0,
        ))
        for c in range(n_cams):
            cams.append(ImportedCamera(
                position=[float(rng.uniform(-1, 1)),
                          float(rng.uniform(-0.5, 0.5)),
                          float(rng.uniform(-1, 1))],
                rotation=[1, 0, 0, 0],
                fov_y_degrees=float(70 + 10 * c),
            ))
        worlds.append(WorldInit(num_instances=1, instance_offset=w,
                                num_cameras=n_cams,
                                camera_offset=w * n_cams))
    return build([quad_xz(half=30.0, y=0.0)], insts, cams, worlds)


@pytest.mark.parametrize("wc_shape", [(4, 2), (2, 4)])
def test_parity_supertile_multicam(monkeypatch, wc_shape):
    """Supertile camera fold (C > 1): budgets that fold cameras inside
    one world (C % wpp == 0) and whole multi-camera worlds
    (wpp % C == 0) must be bitwise equal to the reference and to
    budget 1. (4, 2): budget 2 = pure camera fold, 8/16 = world folds
    of 2-camera worlds. (2, 4): budget 2 folds half a world's cameras,
    8 folds both worlds."""
    n_worlds, n_cams = wc_shape
    state, scene = _multicam_scene(n_worlds, n_cams)
    ref = rt_ref(state, scene, height=32, width=128)
    outs = {}
    for budget in ["1", "2", "8", "16"]:
        monkeypatch.setenv("MRT_SUPERTILE", budget)
        outs[budget] = rt_pal(state, scene, height=32, width=128,
                              interpret=True)
        _assert_frames_equal(ref, outs[budget])
    base = outs["1"]
    for budget, out in outs.items():
        np.testing.assert_array_equal(np.asarray(base.rgb),
                                      np.asarray(out.rgb))
        np.testing.assert_array_equal(np.asarray(base.depth),
                                      np.asarray(out.depth))
        np.testing.assert_array_equal(np.asarray(base.segmask),
                                      np.asarray(out.segmask))
    assert (np.asarray(ref.segmask) >= 0).any()


@pytest.mark.parametrize("shape", [(32, 128), (64, 256)])
def test_parity_supertile_budgets(monkeypatch, shape):
    """MRT_SUPERTILE only re-tiles the grid (worlds and/or pixel tiles
    folded into one program); every budget must be bitwise equal to the
    reference and to budget 1. (32, 128) is a single-tile image, so
    budgets >= 8 exercise the pure world-fold (wpp=8); (64, 256) has 4
    tiles, so budget 4 folds tiles only and budget 64 folds both
    (tpp=4, wpp=8)."""
    h, w = shape
    state, scene = _eight_world_scene()
    ref = rt_ref(state, scene, height=h, width=w)
    outs = {}
    for budget in ["1", "4", "8", "64"]:
        monkeypatch.setenv("MRT_SUPERTILE", budget)
        outs[budget] = rt_pal(state, scene, height=h, width=w,
                              interpret=True)
        _assert_frames_equal(ref, outs[budget])
    base = outs["1"]
    for budget, out in outs.items():
        np.testing.assert_array_equal(np.asarray(base.rgb),
                                      np.asarray(out.rgb))
        np.testing.assert_array_equal(np.asarray(base.depth),
                                      np.asarray(out.depth))
        np.testing.assert_array_equal(np.asarray(base.segmask),
                                      np.asarray(out.segmask))
    assert (np.asarray(ref.segmask) >= 0).any()
