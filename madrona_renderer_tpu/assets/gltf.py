"""glTF 2.0 / GLB importer (pure Python, numpy output).

Extends the asset-import surface beyond the reference's exercised OBJ path
(the engine importer the reference links also handles glTF — cgltf inside
``madrona_importer``; the reference app only ships OBJ fixtures, so this is
capability parity with the engine layer, SURVEY.md §2.2 importer row).

Scope: meshes (POSITION / NORMAL / TEXCOORD_0 / indices), node hierarchy
transforms baked into vertices (default scene), pbrMetallicRoughness
materials (baseColorFactor, baseColorTexture, roughnessFactor,
metallicFactor), PNG/KTX2 images and — via the Pillow tier
(assets/pil_tier.py) — JPEG and friends (embedded in GLB/bufferViews,
data: URIs, or external files), sparse accessors (§3.6.2.3 substitution,
applied before normalization). Unsupported-but-gated: Draco/meshopt
compression. (The native C++ tier additionally gates sparse accessors
and falls back to this parser for them.)
"""

from __future__ import annotations

import base64
import json
import os
import struct
from typing import Dict, List, Optional

import numpy as np

from .obj import SourceMaterial, SourceMesh, SourceObject
from .png import decode_png

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_glb(data: bytes):
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != 0x46546C67:  # 'glTF'
        raise ValueError("not a GLB file")
    if version != 2:
        raise NotImplementedError(f"GLB version {version}")
    pos = 12
    gltf = None
    binary = b""
    while pos + 8 <= len(data):
        chunk_len, chunk_type = struct.unpack_from("<II", data, pos)
        body = data[pos + 8 : pos + 8 + chunk_len]
        pos += 8 + chunk_len
        if chunk_type == 0x4E4F534A:  # 'JSON'
            gltf = json.loads(body)
        elif chunk_type == 0x004E4942:  # 'BIN\0'
            binary = bytes(body)
    if gltf is None:
        raise ValueError("GLB missing JSON chunk")
    return gltf, binary


class _Buffers:
    def __init__(self, gltf: dict, binary: bytes, base_dir: str):
        self.gltf = gltf
        self.base_dir = base_dir
        self._buffers: Dict[int, bytes] = {}
        self._glb_bin = binary

    def buffer(self, i: int) -> bytes:
        if i not in self._buffers:
            spec = self.gltf.get("buffers", [])[i]
            uri = spec.get("uri")
            if uri is None:
                self._buffers[i] = self._glb_bin
            elif uri.startswith("data:"):
                self._buffers[i] = base64.b64decode(uri.split(",", 1)[1])
            else:
                with open(os.path.join(self.base_dir, uri), "rb") as f:
                    self._buffers[i] = f.read()
        return self._buffers[i]

    def view_bytes(self, view_idx: int) -> bytes:
        view = self.gltf["bufferViews"][view_idx]
        buf = self.buffer(view.get("buffer", 0))
        off = view.get("byteOffset", 0)
        return buf[off : off + view["byteLength"]]

    def accessor(self, idx: int) -> np.ndarray:
        acc = self.gltf["accessors"][idx]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        ncomp = _TYPE_COUNTS[acc["type"]]
        count = acc["count"]
        if "bufferView" not in acc:
            out = np.zeros((count, ncomp), dtype)
        else:
            view = self.gltf["bufferViews"][acc["bufferView"]]
            raw = self.buffer(view.get("buffer", 0))
            base = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
            itemsize = np.dtype(dtype).itemsize
            stride = view.get("byteStride") or ncomp * itemsize
            if stride == ncomp * itemsize:
                out = np.frombuffer(raw, dtype, count=count * ncomp, offset=base)
                out = out.reshape(count, ncomp).copy()
            else:
                # Strided (interleaved) layout.
                out = np.empty((count, ncomp), dtype)
                for k in range(count):
                    out[k] = np.frombuffer(
                        raw, dtype, count=ncomp, offset=base + k * stride
                    )
        if "sparse" in acc:
            # Sparse substitution (glTF 2.0 §3.6.2.3): the base (or a
            # zero-filled array when bufferView is absent) is patched at
            # `indices` with `values`; both sub-views are tightly packed.
            # Applied BEFORE normalization — values share the accessor's
            # componentType, so they rescale together with the base.
            sp = acc["sparse"]
            n = sp["count"]
            ispec = sp["indices"]
            idt = _COMPONENT_DTYPES[ispec["componentType"]]
            indices = np.frombuffer(
                self.view_bytes(ispec["bufferView"]), idt, count=n,
                offset=ispec.get("byteOffset", 0),
            ).astype(np.int64)
            if n and (indices.max() >= count or indices.min() < 0):
                raise ValueError("glTF sparse accessor index out of range")
            vspec = sp["values"]
            values = np.frombuffer(
                self.view_bytes(vspec["bufferView"]), dtype, count=n * ncomp,
                offset=vspec.get("byteOffset", 0),
            ).reshape(n, ncomp)
            out[indices] = values
        if acc.get("normalized"):
            # KHR-normalized integer attributes rescale to [0,1] / [-1,1]
            # (glTF 2.0 §3.6.2.2).
            scale = {
                5120: 127.0, 5121: 255.0, 5122: 32767.0, 5123: 65535.0,
            }.get(acc["componentType"])
            if scale is not None:
                out = out.astype(np.float32) / scale
                if acc["componentType"] in (5120, 5122):  # signed
                    out = np.maximum(out, -1.0)
        return out


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "translation" in node:
        m[:3, 3] = node["translation"]
    if "rotation" in node:
        x, y, z, w = node["rotation"]  # glTF stores xyzw
        rot = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        m[:3, :3] = m[:3, :3] @ rot
    if "scale" in node:
        m[:3, :3] = m[:3, :3] @ np.diag(node["scale"])
    return m


def parse_gltf(path: str) -> SourceObject:
    """Parse a .gltf/.glb file into one SourceObject (node transforms baked
    into vertices; one SourceMesh per primitive instance)."""
    base_dir = os.path.dirname(path)
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"glTF":
        gltf, binary = _load_glb(data)
    else:
        gltf = json.loads(data)
        binary = b""
    bufs = _Buffers(gltf, binary, base_dir)

    # Root-level required-extension gate (glTF §3.12): an unsupported
    # entry in extensionsRequired means the file CANNOT be read without
    # it — e.g. EXT_meshopt_compression / KHR_draco_mesh_compression
    # rewrite bufferView contents, which the per-primitive gate below
    # never sees (the accessor would decode the compressed bytes as
    # vertex data). Loud crash-only gate, matching the reference's
    # behavior of refusing files its loaders can't parse.
    _SUPPORTED_REQUIRED = {"KHR_texture_basisu"}
    for ext in gltf.get("extensionsRequired", []):
        if ext not in _SUPPORTED_REQUIRED:
            raise NotImplementedError(
                f"glTF: required extension {ext!r} is not supported "
                "(extensionsRequired)"
            )

    # --- Materials ---
    obj = SourceObject()
    image_cache: Dict[int, np.ndarray] = {}

    def load_image(img_idx: int) -> Optional[np.ndarray]:
        if img_idx in image_cache:
            return image_cache[img_idx]
        img = gltf.get("images", [])[img_idx]
        raw = None
        if "bufferView" in img:
            raw = bufs.view_bytes(img["bufferView"])
        elif "uri" in img:
            uri = img["uri"]
            if uri.startswith("data:"):
                raw = base64.b64decode(uri.split(",", 1)[1])
            else:
                with open(os.path.join(base_dir, uri), "rb") as f:
                    raw = f.read()
        if raw is None:
            return None
        if raw[:8] == b"\x89PNG\r\n\x1a\n":
            image_cache[img_idx] = decode_png(raw)
        elif raw[:12] == b"\xabKTX 20\xbb\r\n\x1a\n":
            from .ktx2 import decode_ktx2

            # all_levels: a multi-level embedded KTX2 feeds its
            # author-provided mip pyramid into the bake verbatim,
            # exactly like the same file referenced by path
            # (importer.py ktx2 handler) — the two routes must not
            # produce different trilinear output for identical bytes.
            image_cache[img_idx] = decode_ktx2(raw, all_levels=True)
        else:
            # JPEG (core glTF) and the long tail via the Pillow tier;
            # loud NotImplementedError if Pillow is absent.
            from .pil_tier import decode_pil

            try:
                image_cache[img_idx] = decode_pil(raw)
            except NotImplementedError:
                raise
            except Exception as e:
                raise ValueError(
                    f"glTF embedded image {img_idx}: unrecognized format"
                ) from e
        return image_cache[img_idx]

    for mi, mat in enumerate(gltf.get("materials", [])):
        pbr = mat.get("pbrMetallicRoughness", {})
        color = tuple(pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0]))
        tex_image = None
        if "baseColorTexture" in pbr:
            tex = gltf["textures"][pbr["baseColorTexture"]["index"]]
            # KHR_texture_basisu: the KTX2 image rides the extension's
            # `source`; plain `source` is the (optional) PNG fallback.
            basisu = tex.get("extensions", {}).get("KHR_texture_basisu")
            if basisu is not None and "source" in basisu:
                tex_image = load_image(basisu["source"])
            elif "source" in tex:
                tex_image = load_image(tex["source"])
        obj.materials.append(
            SourceMaterial(
                name=mat.get("name", f"material_{mi}"),
                color=color,
                texture_image=tex_image,
                roughness=float(pbr.get("roughnessFactor", 0.8)),
                metalness=float(pbr.get("metallicFactor", 0.2)),
            )
        )

    # --- Nodes → world transforms (default scene, or all root nodes) ---
    nodes = gltf.get("nodes", [])
    scene_idx = gltf.get("scene", 0)
    scenes = gltf.get("scenes", [{}])
    roots = scenes[scene_idx].get("nodes", list(range(len(nodes))))

    mesh_instances: List[tuple] = []  # (mesh_idx, world_matrix)

    def walk(node_idx: int, parent: np.ndarray):
        node = nodes[node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh_instances.append((node["mesh"], world))
        for child in node.get("children", ()):
            walk(child, world)

    for r in roots:
        walk(r, np.eye(4))
    if not mesh_instances:  # meshes without nodes: identity
        mesh_instances = [(i, np.eye(4)) for i in range(len(gltf.get("meshes", [])))]

    # --- Primitives → SourceMeshes ---
    for mesh_idx, world in mesh_instances:
        mesh = gltf["meshes"][mesh_idx]
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:
                raise NotImplementedError("glTF: only TRIANGLES primitives")
            if "extensions" in prim:
                for ext in prim["extensions"]:
                    if "draco" in ext.lower() or "meshopt" in ext.lower():
                        raise NotImplementedError(f"glTF: {ext} compression")
            attrs = prim["attributes"]
            pos = bufs.accessor(attrs["POSITION"]).astype(np.float32)
            pos_w = (pos @ world[:3, :3].T + world[:3, 3]).astype(np.float32)
            normals = None
            if "NORMAL" in attrs:
                nrm = bufs.accessor(attrs["NORMAL"]).astype(np.float32)
                # inverse-transpose for correctness under non-uniform scale
                inv_t = np.linalg.inv(world[:3, :3]).T
                normals = (nrm @ inv_t.T).astype(np.float32)
            uvs = None
            if "TEXCOORD_0" in attrs:
                uv = bufs.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                # glTF UV origin is top-left; our convention (OBJ/GL) is
                # bottom-left: flip v.
                uvs = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)
            if "indices" in prim:
                idx = bufs.accessor(prim["indices"]).reshape(-1).astype(np.uint32)
            else:
                idx = np.arange(len(pos_w), dtype=np.uint32)
            obj.meshes.append(
                SourceMesh(
                    positions=pos_w,
                    uvs=uvs,
                    normals=normals,
                    indices=idx,
                    material_idx=int(prim.get("material", -1)),
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
