"""Asset import orchestration: disk assets + raw geometry + image decode.

Re-creates the import pipeline the reference drives in ``loadRenderObjects``
(reference ``src/mgr.cpp:274-363``):

  1. import each disk asset (OBJ+MTL) in path order,
  2. append raw in-memory geometry as additional objects
     (``importRawGeometry``, ``src/mgr.cpp:214-272``),
  3. append additional textures after asset-file textures,
  4. append additional materials after asset-file materials, with their
     texture ids offset by the pre-existing texture count
     (``src/mgr.cpp:316-337``),
  5. apply per-asset material overrides.

Object-ID ordering contract: disk assets first, then raw meshes — spelled
out in the reference smoke test (``scripts/test.py:7-9``).

Documented divergences from the reference (intentional fixes, not drift):
  * Raw-geometry material ids index the *additional materials* list, as the
    reference's own Python docs promise (``scripts/test.py:104-107``); the
    reference forgets to offset them past asset-file materials
    (``src/mgr.cpp:257``). We offset.
  * ``ImportedAsset.mat_id`` overrides are applied; the reference carries
    the parameters but has the application block disabled
    (``src/mgr.cpp:339-349`` is ``#if 0``).
  * Textures normalize to RGBA8 texels (TPU samples raw texels); the
    reference transcodes KTX2 → BC7 blocks for CUDA sampling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..config import AdditionalMaterial, GeometryConfig, ImportedAsset
from .obj import SourceMaterial, SourceMesh, SourceObject, parse_obj
from .png import decode_png
from .ktx2 import decode_ktx2


@dataclass
class ImportedAssets:
    """Merged import result: objects + global material/texture tables.

    Analog of ``madrona::imp::ImportedAssets`` as used by the reference
    (``src/mgr.cpp:311-362``). ``objects[i].meshes[*].material_idx`` indexes
    ``materials``; ``materials[*].texture_idx`` indexes ``textures``.
    """

    objects: List[SourceObject] = field(default_factory=list)
    materials: List[AdditionalMaterial] = field(default_factory=list)
    textures: List[np.ndarray] = field(default_factory=list)  # RGBA8 [H, W, 4]


class ImageImporter:
    """Extension-dispatched image decoder with pluggable handlers.

    Analog of ``imp::ImageImporter`` (+ ``addHandler("ktx2", fn)`` usage,
    reference ``src/mgr.cpp:297-298``). Handlers map file bytes → an
    RGBA8 ``[H, W, 4]`` array, or an ``assets.ktx2.MipChain`` when the
    container carries an author-provided mip pyramid (``bake_scene``
    accepts either; plain-array consumers should check ``isinstance``).
    """

    def __init__(self) -> None:
        self._handlers: Dict[str, Callable[[bytes], "np.ndarray"]] = {
            "png": decode_png,
            # Multi-level KTX2 files yield their author-provided mip
            # pyramid (ktx2.MipChain); bake_scene uses those levels
            # verbatim instead of regenerating them (libktx parity).
            "ktx2": lambda b: decode_ktx2(b, all_levels=True),
        }
        # Prefer the native C++ decoder when available (identical output,
        # cross-checked by tests; MRT_NATIVE=0 disables).
        from .. import native

        if native.available():
            self._handlers["png"] = native.decode_png_native
        # Pillow tier for the formats the self-contained decoders don't
        # cover (JPEG is core glTF — see assets/pil_tier.py).
        from .pil_tier import decode_pil, pil_available

        if pil_available():
            for ext in ("jpg", "jpeg", "bmp", "tga", "webp"):
                self._handlers[ext] = decode_pil

    def add_handler(self, ext: str, fn: Callable[[bytes], "np.ndarray"]) -> None:
        """fn: bytes -> RGBA8 array (or a ktx2.MipChain pyramid)."""
        self._handlers[ext.lower().lstrip(".")] = fn

    def import_image(self, path: str):
        """-> RGBA8 [H, W, 4] array, or ktx2.MipChain for multi-level
        containers (see class docstring)."""
        ext = os.path.splitext(path)[1].lower().lstrip(".")
        handler = self._handlers.get(ext)
        if handler is None:
            raise ValueError(f"no image handler for extension '.{ext}' ({path})")
        with open(path, "rb") as f:
            return handler(f.read())


class AssetImporter:
    """Disk-asset importer with extension dispatch.

    Analog of ``imp::AssetImporter`` (reference ``src/mgr.cpp:294-303``).
    Currently handles ``.obj`` (with .mtl sidecars); the dispatch table is
    open for gltf/usd handlers in later revisions.
    """

    def __init__(self) -> None:
        from .gltf import parse_gltf

        self.image_importer = ImageImporter()
        self._mesh_handlers: Dict[str, Callable[[str], SourceObject]] = {
            "obj": parse_obj,
            "gltf": parse_gltf,
            "glb": parse_gltf,
        }
        from .. import native

        if native.available():
            self._mesh_handlers["obj"] = native.parse_obj_native
            # Native GLB/glTF fast path (gltf.cpp; cgltf analog) with
            # transparent fallback to the Python parser on scope gates.
            self._mesh_handlers["gltf"] = native.parse_gltf_native
            self._mesh_handlers["glb"] = native.parse_gltf_native

    def add_mesh_handler(self, ext: str, fn: Callable[[str], SourceObject]) -> None:
        self._mesh_handlers[ext.lower().lstrip(".")] = fn

    def import_from_disk(self, paths: Sequence[str]) -> List[SourceObject]:
        objects = []
        for path in paths:
            ext = os.path.splitext(path)[1].lower().lstrip(".")
            handler = self._mesh_handlers.get(ext)
            if handler is None:
                raise ValueError(f"no mesh handler for extension '.{ext}' ({path})")
            if not os.path.exists(path):
                raise FileNotFoundError(f"Failed to load render assets: {path}")
            objects.append(handler(path))
        return objects


def import_raw_geometry(geo: GeometryConfig) -> List[SourceObject]:
    """Raw SoA geometry → one single-mesh SourceObject per mesh.

    Mirrors the slicing of ``importRawGeometry`` (reference
    ``src/mgr.cpp:214-272``): mesh i's vertices span
    [offset[i], offset[i+1]) with the last mesh running to the array end.
    Material ids are kept as raw *additional-material* indices here; the
    merge step offsets them into the global table.
    """
    objects: List[SourceObject] = []
    n = geo.num_meshes
    verts = np.asarray(geo.vertices, np.float32).reshape(-1, 3)
    uvs = np.asarray(geo.uvs, np.float32).reshape(-1, 2)
    indices = np.asarray(geo.indices, np.uint32).reshape(-1)
    v_off = np.asarray(geo.mesh_vertex_offsets, np.int64).reshape(-1)
    i_off = np.asarray(geo.mesh_index_offsets, np.int64).reshape(-1)
    mats = np.asarray(geo.mesh_materials, np.int64).reshape(-1)
    for i in range(n):
        v0 = int(v_off[i])
        v1 = int(v_off[i + 1]) if i + 1 < n else verts.shape[0]
        i0 = int(i_off[i])
        i1 = int(i_off[i + 1]) if i + 1 < n else indices.shape[0]
        mesh = SourceMesh(
            positions=verts[v0:v1].copy(),
            uvs=uvs[v0:v1].copy() if uvs.shape[0] >= v1 else None,
            normals=None,
            indices=(indices[i0:i1].astype(np.int64) - 0).astype(np.uint32),
            material_idx=int(mats[i]),
        )
        objects.append(SourceObject(meshes=[mesh], materials=[]))
    return objects


def load_render_assets(
    geo_cfg: GeometryConfig,
    asset_paths: Sequence[ImportedAsset],
    additional_mats: Sequence[AdditionalMaterial],
    additional_textures: Sequence[str],
    importer: Optional[AssetImporter] = None,
) -> ImportedAssets:
    """Full merge, mirroring ``loadRenderObjects`` (``src/mgr.cpp:274-363``)."""
    importer = importer or AssetImporter()
    out = ImportedAssets()

    tex_path_to_idx: Dict[str, int] = {}

    def intern_texture(path: str) -> int:
        if path not in tex_path_to_idx:
            tex_path_to_idx[path] = len(out.textures)
            out.textures.append(importer.image_importer.import_image(path))
        return tex_path_to_idx[path]

    def intern_material(src: SourceMaterial) -> int:
        if src.texture_image is not None:
            tex_idx = len(out.textures)
            out.textures.append(src.texture_image)
        elif src.texture_path:
            tex_idx = intern_texture(src.texture_path)
        else:
            tex_idx = -1
        out.materials.append(
            AdditionalMaterial(
                color=tuple(src.color),
                texture_id=tex_idx,
                roughness=src.roughness,
                metalness=src.metalness,
            )
        )
        return len(out.materials) - 1

    # 1. Disk assets, remapping file-local material ids to the global table.
    disk_objects = importer.import_from_disk([a.path for a in asset_paths])
    for obj in disk_objects:
        global_ids = [intern_material(m) for m in obj.materials]
        for mesh in obj.meshes:
            if mesh.material_idx >= 0:
                mesh.material_idx = global_ids[mesh.material_idx]
        out.objects.append(obj)

    old_tex_count = len(out.textures)
    old_mat_count = len(out.materials)

    # 2. Raw geometry objects (material ids fixed up after additional mats
    #    are appended — they index the additional-material list).
    raw_objects = import_raw_geometry(geo_cfg)

    # 3+4. Additional textures then materials (texture ids offset, matching
    #      src/mgr.cpp:316-337).
    add_tex_ids = [intern_texture(p) for p in additional_textures]
    for mat in additional_mats:
        tex = int(mat.texture_id)
        if tex != -1:
            tex = add_tex_ids[tex] if tex < len(add_tex_ids) else old_tex_count + tex
        out.materials.append(
            AdditionalMaterial(
                color=tuple(mat.color),
                texture_id=tex,
                roughness=mat.roughness,
                metalness=mat.metalness,
            )
        )

    for obj in raw_objects:
        for mesh in obj.meshes:
            if mesh.material_idx >= 0:
                mesh.material_idx += old_mat_count
        out.objects.append(obj)

    # 5. Per-asset material overrides (reference's disabled block,
    #    src/mgr.cpp:339-349, implemented as intended).
    for i, asset in enumerate(asset_paths):
        if asset.mat_id is not None and asset.mat_id != -1:
            for mesh in out.objects[i].meshes:
                mesh.material_idx = old_mat_count + int(asset.mat_id)

    return out
