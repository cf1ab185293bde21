"""glTF/GLB import tests (fixtures built programmatically in-test)."""

import base64
import json
import struct

import numpy as np
import pytest

from madrona_renderer_tpu.assets.gltf import parse_gltf
from madrona_renderer_tpu.assets.png import encode_png


def _accessor_blob():
    """Build a quad mesh (4 verts, 2 tris) binary blob + accessors."""
    positions = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    normals = np.tile(np.array([[0, -1, 0]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 48},
        {"buffer": 0, "byteOffset": 48, "byteLength": 48},
        {"buffer": 0, "byteOffset": 96, "byteLength": 32},
        {"buffer": 0, "byteOffset": 128, "byteLength": 12},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
        {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
    ]
    return blob, views, accessors, positions, uvs


def _make_glb(gltf: dict, blob: bytes) -> bytes:
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    blob += b"\0" * (-len(blob) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    return (
        struct.pack("<III", 0x46546C67, 2, total)
        + struct.pack("<II", len(js), 0x4E4F534A)
        + js
        + struct.pack("<II", len(blob), 0x004E4942)
        + blob
    )


def _base_gltf(views, accessors):
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "name": "quad",
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.2, 0.4, 0.8, 1.0],
                    "roughnessFactor": 0.5,
                    "metallicFactor": 0.1,
                },
            }
        ],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"byteLength": 140}],
    }


def test_glb_roundtrip(tmp_path):
    blob, views, accessors, positions, uvs = _accessor_blob()
    glb = _make_glb(_base_gltf(views, accessors), blob)
    path = str(tmp_path / "quad.glb")
    with open(path, "wb") as f:
        f.write(glb)
    obj = parse_gltf(path)
    assert len(obj.meshes) == 1 and len(obj.materials) == 1
    mesh = obj.meshes[0]
    np.testing.assert_allclose(mesh.positions, positions)
    assert mesh.num_faces == 2
    assert mesh.material_idx == 0
    # UV v-flip (glTF top-left → our bottom-left)
    np.testing.assert_allclose(mesh.uvs[:, 1], 1.0 - uvs[:, 1])
    assert obj.materials[0].color == (0.2, 0.4, 0.8, 1.0)
    assert obj.materials[0].roughness == 0.5


def test_gltf_json_with_data_uri(tmp_path):
    blob, views, accessors, positions, _ = _accessor_blob()
    gltf = _base_gltf(views, accessors)
    gltf["buffers"] = [
        {
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode(),
        }
    ]
    path = str(tmp_path / "quad.gltf")
    with open(path, "w") as f:
        json.dump(gltf, f)
    obj = parse_gltf(path)
    np.testing.assert_allclose(obj.meshes[0].positions, positions)


def test_node_transform_baked(tmp_path):
    blob, views, accessors, positions, _ = _accessor_blob()
    gltf = _base_gltf(views, accessors)
    gltf["nodes"] = [{"mesh": 0, "translation": [10, 0, 0], "scale": [2, 2, 2]}]
    path = str(tmp_path / "moved.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    obj = parse_gltf(path)
    np.testing.assert_allclose(
        obj.meshes[0].positions, positions * 2 + [10, 0, 0], rtol=1e-6
    )


def test_embedded_png_texture(tmp_path, rng):
    blob, views, accessors, _, _ = _accessor_blob()
    tex = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    png = encode_png(tex)
    img_off = len(blob) + (-len(blob) % 4)
    blob = blob + b"\0" * (-len(blob) % 4) + png
    gltf = _base_gltf(views, accessors)
    gltf["bufferViews"].append(
        {"buffer": 0, "byteOffset": img_off, "byteLength": len(png)}
    )
    gltf["buffers"] = [{"byteLength": len(blob)}]
    gltf["images"] = [{"bufferView": 4, "mimeType": "image/png"}]
    gltf["textures"] = [{"source": 0}]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    path = str(tmp_path / "tex.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    obj = parse_gltf(path)
    np.testing.assert_array_equal(obj.materials[0].texture_image, tex)


def test_gltf_renders_end_to_end(tmp_path):
    """A GLB asset through the full Manager pipeline."""
    import madrona_renderer_tpu as m

    blob, views, accessors, _, _ = _accessor_blob()
    path = str(tmp_path / "quad.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(_base_gltf(views, accessors), blob))
    r = m.MadronaRenderer(
        gpu_id=0,
        num_worlds=1,
        render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=16,
        batch_render_view_height=16,
        asset_paths=[m.ImportedAsset(path=path)],
        instances=[
            m.ImportedInstance(
                position=[0, 10, 0], rotation=[1, 0, 0, 0], scale=[8, 1, 8], object_id=0
            )
        ],
        cameras=[m.ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
        worlds=[m.WorldInit(num_instances=1, instance_offset=0, num_cameras=1, camera_offset=0)],
    )
    seg = r.segmask_tensor().numpy()
    assert (seg == 0).any()
    rgb = r.rgb_tensor().numpy()
    # Blue-ish base color shows.
    hits = seg[0] == 0
    assert rgb[0][hits][:, 2].mean() > rgb[0][hits][:, 0].mean()


def test_sparse_accessor_substitution(tmp_path):
    """glTF 2.0 §3.6.2.3: sparse patch over a dense POSITION base."""
    blob, views, accessors, positions, _ = _accessor_blob()
    sp_indices = np.array([1, 3], np.uint16)
    sp_values = np.array([[9.0, 9.0, 9.0], [-5.0, 0.5, 2.0]], np.float32)
    base = len(blob)
    blob = blob + sp_indices.tobytes() + sp_values.tobytes()
    views = views + [
        {"buffer": 0, "byteOffset": base, "byteLength": 4},
        {"buffer": 0, "byteOffset": base + 4, "byteLength": 24},
    ]
    accessors[0]["sparse"] = {
        "count": 2,
        "indices": {"bufferView": 4, "componentType": 5123},
        "values": {"bufferView": 5},
    }
    gltf = _base_gltf(views, accessors)
    path = str(tmp_path / "sparse.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    obj = parse_gltf(path)
    want = positions.copy()
    want[sp_indices] = sp_values
    np.testing.assert_allclose(obj.meshes[0].positions, want)


def test_sparse_accessor_index_out_of_range(tmp_path):
    blob, views, accessors, _, _ = _accessor_blob()
    base = len(blob)
    blob = blob + np.array([7], np.uint16).tobytes() + np.zeros(3, np.float32).tobytes()
    views = views + [
        {"buffer": 0, "byteOffset": base, "byteLength": 2},
        {"buffer": 0, "byteOffset": base + 2, "byteLength": 12},
    ]
    accessors[0]["sparse"] = {
        "count": 1,
        "indices": {"bufferView": 4, "componentType": 5123},
        "values": {"bufferView": 5},
    }
    path = str(tmp_path / "sparse_oob.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(_base_gltf(views, accessors), blob))
    with pytest.raises(ValueError, match="sparse"):
        parse_gltf(path)


def test_normalized_uint16_uvs(tmp_path):
    """normalized:true integer accessors rescale (glTF 2.0 §3.6.2.2)."""
    import struct as _struct

    blob, views, accessors, positions, _ = _accessor_blob()
    # Append u16-normalized UVs: (0, 65535, 32767, 0) per vertex pairs.
    uv16 = np.array([[0, 0], [65535, 0], [65535, 65535], [0, 65535]], np.uint16)
    off = len(blob)
    blob = blob + uv16.tobytes()
    gltf = _base_gltf(views, accessors)
    gltf["bufferViews"].append({"buffer": 0, "byteOffset": off, "byteLength": 16})
    gltf["accessors"].append(
        {"bufferView": 4, "componentType": 5123, "count": 4, "type": "VEC2",
         "normalized": True}
    )
    gltf["meshes"][0]["primitives"][0]["attributes"]["TEXCOORD_0"] = 4
    gltf["buffers"] = [{"byteLength": len(blob)}]
    path = str(tmp_path / "norm.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    obj = parse_gltf(path)
    # v-flipped: v' = 1 - v
    np.testing.assert_allclose(
        obj.meshes[0].uvs,
        np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32),
        atol=1e-4,
    )


def test_embedded_ktx2_texture_khr_basisu(tmp_path, rng):
    """KHR_texture_basisu: a BasisLZ/ETC1S KTX2 image embedded in the GLB
    decodes through the native transcoder (lossy, so compare against the
    standalone KTX2 decode of the same bytes)."""
    from madrona_renderer_tpu.assets.etc1s_encode import encode_ktx2_etc1s
    from madrona_renderer_tpu.assets.ktx2 import decode_ktx2

    blob, views, accessors, _, _ = _accessor_blob()
    tex = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    k2 = encode_ktx2_etc1s(tex)
    img_off = len(blob) + (-len(blob) % 4)
    blob = blob + b"\0" * (-len(blob) % 4) + k2
    gltf = _base_gltf(views, accessors)
    gltf["bufferViews"].append(
        {"buffer": 0, "byteOffset": img_off, "byteLength": len(k2)}
    )
    gltf["buffers"] = [{"byteLength": len(blob)}]
    gltf["images"] = [{"bufferView": 4, "mimeType": "image/ktx2"}]
    gltf["textures"] = [
        {"extensions": {"KHR_texture_basisu": {"source": 0}}}
    ]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    gltf["extensionsUsed"] = ["KHR_texture_basisu"]
    path = str(tmp_path / "tex_basisu.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    obj = parse_gltf(path)
    np.testing.assert_array_equal(
        obj.materials[0].texture_image, decode_ktx2(k2)
    )


def test_embedded_multilevel_ktx2_keeps_mip_pyramid(tmp_path, rng):
    """A multi-level KTX2 embedded in a GLB must yield the same
    author-provided mip pyramid as the identical bytes imported by path
    (importer.py's ktx2 handler uses all_levels=True; the embedded route
    must not silently drop levels and let the bake regenerate them)."""
    from madrona_renderer_tpu.assets.ktx2 import (
        MipChain, decode_ktx2, encode_ktx2_rgba8_mips,
    )

    blob, views, accessors, _, _ = _accessor_blob()
    levels = [
        rng.integers(0, 256, size=(8 >> l, 8 >> l, 4), dtype=np.uint8)
        for l in range(3)
    ]
    k2 = encode_ktx2_rgba8_mips(levels)
    img_off = len(blob) + (-len(blob) % 4)
    blob = blob + b"\0" * (-len(blob) % 4) + k2
    gltf = _base_gltf(views, accessors)
    gltf["bufferViews"].append(
        {"buffer": 0, "byteOffset": img_off, "byteLength": len(k2)}
    )
    gltf["buffers"] = [{"byteLength": len(blob)}]
    gltf["images"] = [{"bufferView": 4, "mimeType": "image/ktx2"}]
    gltf["textures"] = [{"source": 0}]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    path = str(tmp_path / "tex_mips.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    got = parse_gltf(path).materials[0].texture_image
    want = decode_ktx2(k2, all_levels=True)
    assert isinstance(got, MipChain) and isinstance(want, MipChain)
    assert len(got.levels) == len(want.levels) == 3
    for a, b in zip(got.levels, want.levels):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ext", [
    "EXT_meshopt_compression", "KHR_draco_mesh_compression",
])
def test_required_extension_gate(tmp_path, ext):
    """extensionsRequired entries we can't honor must raise the loud
    NotImplementedError BEFORE any accessor decode: compression
    extensions rewrite bufferView payloads, so reading them as raw
    vertex data would silently produce garbage geometry. Both parser
    tiers (the C++ fast path falls back to Python, which gates)."""
    from madrona_renderer_tpu.native import parse_gltf_native

    blob, views, accessors, _, _ = _accessor_blob()
    gltf = _base_gltf(views, accessors)
    gltf["extensionsRequired"] = [ext]
    gltf["extensionsUsed"] = [ext]
    p = tmp_path / "compressed.glb"
    p.write_bytes(_make_glb(gltf, blob))
    with pytest.raises(NotImplementedError, match=ext):
        parse_gltf(str(p))
    with pytest.raises(NotImplementedError, match=ext):
        parse_gltf_native(str(p))


def test_required_basisu_extension_allowed(tmp_path, rng):
    """KHR_texture_basisu in extensionsRequired is within scope: the
    Python tier decodes the KTX2 payload, so the root gate must let it
    through (the native tier scope-gates to Python transparently)."""
    from madrona_renderer_tpu.native import parse_gltf_native

    blob, views, accessors, _, _ = _accessor_blob()
    gltf = _base_gltf(views, accessors)
    gltf["extensionsRequired"] = ["KHR_texture_basisu"]
    gltf["extensionsUsed"] = ["KHR_texture_basisu"]
    p = tmp_path / "basisu_required.glb"
    p.write_bytes(_make_glb(gltf, blob))
    for parse in (parse_gltf, parse_gltf_native):
        obj = parse(str(p))
        assert len(obj.meshes) == 1
        np.testing.assert_allclose(
            obj.meshes[0].positions,
            np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                     np.float32),
        )
