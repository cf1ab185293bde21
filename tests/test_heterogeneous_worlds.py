"""Heterogeneous world sizes: per-world instance/camera counts differ.

The reference supports arbitrary per-world slices of the shared arrays
(WorldInit offsets/counts, src/sim.hpp:76-82); padding + masks must keep the
flat export ordering (world-major) and the mutation mapping correct when
worlds are NOT uniform — a seam none of the uniform-scene tests exercise.
"""

import numpy as np
import pytest

import madrona_renderer_tpu as m

from tests.helpers import quad_xz


@pytest.fixture(scope="module")
def renderer():
    # world 0: 3 instances (near, far, side), 2 cameras
    # world 1: 1 instance, 1 camera (aliasing instance index 1)
    quad = quad_xz(half=2.0, y=0.0)
    instances = [
        m.ImportedInstance(position=[0, 8, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0),
        m.ImportedInstance(position=[0, 14, 0], rotation=[1, 0, 0, 0], scale=[3, 1, 3], object_id=0),
        m.ImportedInstance(position=[5, 10, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0),
    ]
    cameras = [
        m.ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0]),
        m.ImportedCamera(position=[0, 2, 0], rotation=[1, 0, 0, 0]),
    ]
    worlds = [
        m.WorldInit(num_instances=3, instance_offset=0, num_cameras=2, camera_offset=0),
        m.WorldInit(num_instances=1, instance_offset=1, num_cameras=1, camera_offset=1),
    ]
    return m.MadronaRenderer(
        gpu_id=0,
        num_worlds=2,
        render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=32,
        batch_render_view_height=32,
        mesh_vertices=quad,
        mesh_uvs=np.zeros((6, 2), np.float32),
        mesh_indices=np.arange(6, dtype=np.uint32),
        mesh_vertex_offsets=np.array([0], np.uint32),
        mesh_indices_offsets=np.array([0], np.uint32),
        mesh_materials=np.array([-1], np.int32),
        instances=instances,
        cameras=cameras,
        worlds=worlds,
    )


def test_flat_export_shapes(renderer):
    # total instances = 3 + 1, total cameras = 2 + 1 (world-major order).
    assert renderer.instance_position_tensor().shape == (4, 3)
    assert renderer.camera_position_tensor().shape == (3, 3)
    assert renderer.rgb_tensor().shape == (3, 32, 32, 4)
    assert renderer.total_num_instances == 4
    assert renderer.total_num_cameras == 3


def test_world_major_ordering(renderer):
    pos = renderer.instance_position_tensor().numpy()
    # world 0 slots: instances 0,1,2; world 1 slot: instance 1's copy.
    np.testing.assert_allclose(pos[0], [0, 8, 0])
    np.testing.assert_allclose(pos[1], [0, 14, 0])
    np.testing.assert_allclose(pos[2], [5, 10, 0])
    np.testing.assert_allclose(pos[3], [0, 14, 0])  # world 1's copy


def test_padded_slots_render_blank(renderer):
    # World 1 has only 1 camera; its flat exports include only that one.
    seg = renderer.segmask_tensor().numpy()
    # Cameras 0,1 belong to world 0 (3 instances: ids 0..2 possible),
    # camera 2 is world 1 (only instance id 0 possible).
    assert set(np.unique(seg[0])) <= {-1, 0, 1, 2}
    assert set(np.unique(seg[2])) <= {-1, 0}
    assert (seg[2] == 0).any()  # world 1 sees its single quad


def test_mutation_maps_to_correct_world(renderer):
    before = renderer.rgb_tensor().numpy().copy()
    pos = renderer.instance_position_tensor().to_torch()
    pos[3][1] -= 4.0  # world 1's instance only
    renderer.step()
    after = renderer.rgb_tensor().numpy()
    # world 0's two cameras unchanged; world 1's camera changed.
    assert (after[0] == before[0]).all()
    assert (after[1] == before[1]).all()
    assert (after[2] != before[2]).any()
    pos[3][1] += 4.0
    renderer.step()


def test_aliased_worlds_independent(renderer):
    """World 1 aliases instance 1's initial slice but owns a copy."""
    pos = renderer.instance_position_tensor().numpy()
    pos[1][0] += 2.0  # world 0's instance 1
    renderer.step()
    after = renderer.instance_position_tensor().numpy()
    np.testing.assert_allclose(after[3], [0, 14, 0])  # world 1 copy untouched
    pos[1][0] -= 2.0
    renderer.step()
