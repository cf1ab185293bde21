"""Wavefront OBJ + MTL importer (pure Python, numpy output).

Re-creates the asset-import contract the reference gets from the Madrona
engine's ``imp::AssetImporter::importFromDisk`` for OBJ files (usage:
reference ``src/mgr.cpp:294-303``): one imported *object* per file, made of
one or more *meshes* (one per material group), each carrying positions,
optional normals/uvs, triangle indices, and a material index into the
object's material list. MTL handling covers the subset the reference data
exercises: ``newmtl``, ``Kd``, ``d``, ``map_Kd`` (see ``data/cube.mtl``).

Faces with >3 corners are fan-triangulated. OBJ's per-corner (v, vt, vn)
index triples are re-indexed into unified vertex buffers per mesh.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class SourceMaterial:
    """Parsed material: base color RGBA, optional texture, pbr params.

    Analog of ``madrona::imp::SourceMaterial`` (bound at reference
    ``src/bindings.cpp:38-54``), with the texture referenced by path (the
    bake step resolves paths to texture-table indices) or carried inline as
    decoded RGBA8 (glTF embedded images).
    """

    name: str = ""
    color: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    texture_path: Optional[str] = None
    texture_image: Optional["np.ndarray"] = None  # RGBA8 [H, W, 4]
    roughness: float = 0.8
    metalness: float = 0.2


@dataclass
class SourceMesh:
    """One triangle mesh. Analog of ``madrona::imp::SourceMesh``
    (field list pinned by reference usage ``src/mgr.cpp:246-259``)."""

    positions: np.ndarray  # float32 [V, 3]
    uvs: Optional[np.ndarray]  # float32 [V, 2] or None
    normals: Optional[np.ndarray]  # float32 [V, 3] or None
    indices: np.ndarray  # uint32 [F * 3]
    material_idx: int = -1  # into the owning object's material list; -1 none

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_faces(self) -> int:
        return int(self.indices.shape[0] // 3)


@dataclass
class SourceObject:
    """One imported asset: meshes + the materials its file declared.
    Analog of ``madrona::imp::SourceObject`` (reference ``src/mgr.cpp:267-270``)."""

    meshes: List[SourceMesh] = field(default_factory=list)
    materials: List[SourceMaterial] = field(default_factory=list)


def parse_mtl(path: str) -> List[SourceMaterial]:
    """Parse a .mtl file into a list of SourceMaterials (file order)."""
    materials: List[SourceMaterial] = []
    cur: Optional[SourceMaterial] = None
    base_dir = os.path.dirname(path)
    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "newmtl":
                cur = SourceMaterial(name=parts[1] if len(parts) > 1 else "")
                materials.append(cur)
            elif cur is None:
                continue
            elif key == "Kd" and len(parts) >= 4:
                kd = [float(parts[1]), float(parts[2]), float(parts[3])]
                cur.color = (kd[0], kd[1], kd[2], cur.color[3])
            elif key == "d" and len(parts) >= 2:
                cur.color = cur.color[:3] + (float(parts[1]),)
            elif key == "Ns" and len(parts) >= 2:
                # Map shininess exponent to roughness in [0, 1] (heuristic;
                # the reference's MTL path feeds an equivalent scalar).
                ns = float(parts[1])
                cur.roughness = float(np.clip(1.0 - ns / 1000.0, 0.0, 1.0))
            elif key == "map_Kd" and len(parts) >= 2:
                tex = parts[-1]
                cur.texture_path = os.path.normpath(os.path.join(base_dir, tex))
    return materials


def _parse_index(tok: str, counts: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """Parse one face corner 'v', 'v/vt', 'v//vn' or 'v/vt/vn' into
    0-based (v, vt, vn) with -1 for absent. Negative indices are relative."""
    fields = tok.split("/")
    out = [-1, -1, -1]
    for i, fstr in enumerate(fields[:3]):
        if fstr == "":
            continue
        idx = int(fstr)
        n = counts[i]
        out[i] = idx - 1 if idx > 0 else n + idx
    return out[0], out[1], out[2]


def parse_obj(path: str) -> SourceObject:
    """Parse an OBJ file into a SourceObject.

    Meshes are split by active material (``usemtl``): all faces sharing a
    material form one mesh, preserving first-use material order. Files
    without ``usemtl`` produce a single mesh with ``material_idx=-1``.
    """
    positions: List[Tuple[float, float, float]] = []
    uvs: List[Tuple[float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    materials: List[SourceMaterial] = []
    mat_name_to_idx: Dict[str, int] = {}

    # Per active material: list of corner triples (v, vt, vn)
    face_groups: Dict[int, List[Tuple[int, int, int]]] = {}
    cur_mat = -1
    base_dir = os.path.dirname(path)

    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "v":
                positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif key == "vt":
                uvs.append((float(parts[1]), float(parts[2]) if len(parts) > 2 else 0.0))
            elif key == "vn":
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif key == "mtllib" and len(parts) >= 2:
                mtl_path = os.path.normpath(os.path.join(base_dir, " ".join(parts[1:])))
                if os.path.exists(mtl_path):
                    for m in parse_mtl(mtl_path):
                        if m.name not in mat_name_to_idx:
                            mat_name_to_idx[m.name] = len(materials)
                            materials.append(m)
            elif key == "usemtl" and len(parts) >= 2:
                name = " ".join(parts[1:])
                if name not in mat_name_to_idx:
                    # Unknown material name: register a default so the
                    # grouping is still stable.
                    mat_name_to_idx[name] = len(materials)
                    materials.append(SourceMaterial(name=name))
                cur_mat = mat_name_to_idx[name]
            elif key == "f":
                counts = (len(positions), len(uvs), len(normals))
                corners = [_parse_index(tok, counts) for tok in parts[1:]]
                group = face_groups.setdefault(cur_mat, [])
                # Fan-triangulate
                for i in range(1, len(corners) - 1):
                    group.extend((corners[0], corners[i], corners[i + 1]))

    pos_arr = np.asarray(positions, np.float32).reshape(-1, 3)
    uv_arr = np.asarray(uvs, np.float32).reshape(-1, 2)
    nrm_arr = np.asarray(normals, np.float32).reshape(-1, 3)

    obj = SourceObject(materials=materials)
    # Deterministic mesh order: material index ascending, -1 (no material)
    # sorted first only if it was used first; keep first-face-use order.
    seen_order = list(face_groups.keys())
    for mat_idx in seen_order:
        corners = face_groups[mat_idx]
        # Re-index unique (v, vt, vn) triples into a unified vertex buffer.
        remap: Dict[Tuple[int, int, int], int] = {}
        indices = np.empty((len(corners),), np.uint32)
        v_list: List[int] = []
        vt_list: List[int] = []
        vn_list: List[int] = []
        for ci, c in enumerate(corners):
            j = remap.get(c)
            if j is None:
                j = len(remap)
                remap[c] = j
                v_list.append(c[0])
                vt_list.append(c[1])
                vn_list.append(c[2])
            indices[ci] = j
        v_idx = np.asarray(v_list, np.int64)
        # Loud range check (the numpy gather would only catch indices past
        # the END — negative resolved indices from an over-deep relative
        # reference would silently wrap): both parser tiers raise
        # ValueError on out-of-range face indices.
        if len(v_idx) and (v_idx.min() < 0 or v_idx.max() >= len(pos_arr)):
            raise ValueError(f"face vertex index out of range in {path}")
        has_uv = any(i >= 0 for i in vt_list)
        has_nrm = any(i >= 0 for i in vn_list)
        mesh_pos = pos_arr[v_idx]
        mesh_uv = None
        if has_uv and len(uv_arr):
            vt_idx = np.asarray([i if i >= 0 else 0 for i in vt_list], np.int64)
            if vt_idx.max() >= len(uv_arr):
                raise ValueError(f"face texcoord index out of range in {path}")
            mesh_uv = uv_arr[vt_idx]
        mesh_nrm = None
        if has_nrm and len(nrm_arr):
            vn_idx = np.asarray([i if i >= 0 else 0 for i in vn_list], np.int64)
            if vn_idx.max() >= len(nrm_arr):
                raise ValueError(f"face normal index out of range in {path}")
            mesh_nrm = nrm_arr[vn_idx]
        obj.meshes.append(
            SourceMesh(
                positions=mesh_pos,
                uvs=mesh_uv,
                normals=mesh_nrm,
                indices=indices,
                material_idx=int(mat_idx),
            )
        )
    if not obj.meshes:
        obj.meshes.append(
            SourceMesh(
                positions=np.zeros((0, 3), np.float32),
                uvs=None,
                normals=None,
                indices=np.zeros((0,), np.uint32),
                material_idx=-1,
            )
        )
    return obj
