"""Shared test helpers: tiny programmatic scenes driven through the real
asset/bake/state pipeline (no mocks — the same code path users hit)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from madrona_renderer_tpu.assets.importer import load_render_assets
from madrona_renderer_tpu.config import (
    AdditionalMaterial,
    GeometryConfig,
    ImportedCamera,
    ImportedInstance,
    WorldInit,
)
from madrona_renderer_tpu.core.scene import bake_scene
from madrona_renderer_tpu.core.state import init_state

IDENTITY_Q = [1.0, 0.0, 0.0, 0.0]


def geo_from_meshes(meshes: Sequence[np.ndarray], uvs=None, materials=None) -> GeometryConfig:
    """meshes: list of [V, 3] float vertex arrays, each forming V//3 tris
    with sequential indices. uvs: optional matching list of [V, 2]."""
    verts = np.concatenate([np.asarray(m, np.float32) for m in meshes], axis=0)
    if uvs is None:
        uv = np.zeros((verts.shape[0], 2), np.float32)
    else:
        uv = np.concatenate([np.asarray(u, np.float32) for u in uvs], axis=0)
    counts = [len(m) for m in meshes]
    v_off = np.cumsum([0] + counts[:-1]).astype(np.uint32)
    indices = np.concatenate(
        [np.arange(c, dtype=np.uint32) for c in counts]
    )
    i_off = v_off.copy()
    mats = (
        np.asarray(materials, np.int32)
        if materials is not None
        else np.full((len(meshes),), -1, np.int32)
    )
    return GeometryConfig(
        vertices=verts,
        uvs=uv,
        indices=indices,
        mesh_vertex_offsets=v_off,
        mesh_index_offsets=i_off,
        mesh_materials=mats,
    )


def quad_xz(half: float = 100.0, y: float = 0.0) -> np.ndarray:
    """Two triangles forming a quad in the XZ plane at the given y,
    spanning [-half, half]² — a wall facing a camera that looks +Y."""
    a = [-half, y, -half]
    b = [half, y, -half]
    c = [half, y, half]
    d = [-half, y, half]
    return np.asarray([a, b, c, a, c, d], np.float32)


def quad_uvs() -> np.ndarray:
    """UVs matching quad_xz corner order: u right (+x), v up (+z)."""
    a, b, c, d = [0, 0], [1, 0], [1, 1], [0, 1]
    return np.asarray([a, b, c, a, c, d], np.float32)


def build(
    meshes: Sequence[np.ndarray],
    instances: Sequence[ImportedInstance],
    cameras: Sequence[ImportedCamera],
    worlds: Optional[Sequence[WorldInit]] = None,
    uvs=None,
    mesh_materials=None,
    additional_mats: Sequence[AdditionalMaterial] = (),
    additional_textures: Sequence[str] = (),
    texture_images: Sequence = (),
    mipmaps="auto",
):
    """Raw meshes + instances + cameras → (state, scene).

    texture_images: in-memory RGBA8 arrays (or ktx2.MipChain pyramids)
    appended to the texture table after the path-loaded ones."""
    if worlds is None:
        worlds = [
            WorldInit(
                num_instances=len(instances),
                instance_offset=0,
                num_cameras=len(cameras),
                camera_offset=0,
            )
        ]
    geo = geo_from_meshes(meshes, uvs=uvs, materials=mesh_materials)
    merged = load_render_assets(geo, [], list(additional_mats), list(additional_textures))
    merged.textures.extend(texture_images)
    scene = bake_scene(merged, mipmaps=mipmaps)
    state = init_state(list(instances), list(cameras), list(worlds))
    return state, scene


def cam_at_origin_looking_plus_y() -> ImportedCamera:
    return ImportedCamera(position=[0.0, 0.0, 0.0], rotation=IDENTITY_Q)
