"""Asset pipeline tests: OBJ/MTL/PNG/KTX2 + merge semantics."""

import os

import numpy as np
import pytest

from madrona_renderer_tpu.assets.importer import (
    AssetImporter,
    import_raw_geometry,
    load_render_assets,
)
from madrona_renderer_tpu.assets.ktx2 import decode_ktx2, encode_ktx2_rgba8
from madrona_renderer_tpu.assets.obj import parse_obj
from madrona_renderer_tpu.assets.png import decode_png, encode_png
from madrona_renderer_tpu.config import AdditionalMaterial, GeometryConfig, ImportedAsset

REFERENCE_DATA = "/root/reference/data"


def test_parse_cube_obj(data_dir):
    obj = parse_obj(os.path.join(data_dir, "cube.obj"))
    assert len(obj.meshes) == 1
    mesh = obj.meshes[0]
    assert mesh.num_faces == 12
    # Re-indexed corners: every (v, vt, vn) combo unique.
    assert mesh.positions.shape[1] == 3
    assert mesh.uvs is not None and mesh.uvs.shape[0] == mesh.positions.shape[0]
    assert mesh.normals is not None
    # Material resolved from MTL with texture path.
    assert len(obj.materials) == 1
    assert obj.materials[0].texture_path.endswith("cube.png")
    # All vertices on the ±0.5 cube.
    assert np.allclose(np.abs(mesh.positions), 0.5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference data absent")
def test_parse_reference_blender_objs():
    """Parse the reference's actual Blender-exported assets (read-only)."""
    cube = parse_obj(os.path.join(REFERENCE_DATA, "cube.obj"))
    assert sum(m.num_faces for m in cube.meshes) == 12
    assert cube.materials and cube.materials[0].texture_path.endswith("cube.png")
    plane = parse_obj(os.path.join(REFERENCE_DATA, "plane.obj"))
    assert sum(m.num_faces for m in plane.meshes) == 2
    assert np.abs(plane.meshes[0].positions).max() == 10000.0
    wall = parse_obj(os.path.join(REFERENCE_DATA, "wall_render.obj"))
    assert sum(m.num_faces for m in wall.meshes) == 12


def test_png_roundtrip(rng):
    img = rng.integers(0, 256, size=(17, 23, 4), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_png_rgb_and_gray(rng):
    rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    out = decode_png(encode_png(rgb))
    np.testing.assert_array_equal(out[..., :3], rgb)
    assert (out[..., 3] == 255).all()
    gray = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    np.testing.assert_array_equal(out[..., 0], gray)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DATA, "cube.png")),
    reason="reference data absent",
)
def test_png_decodes_reference_texture():
    with open(os.path.join(REFERENCE_DATA, "cube.png"), "rb") as f:
        img = decode_png(f.read())
    assert img.ndim == 3 and img.shape[2] == 4
    assert img.shape[0] > 0 and img.shape[1] > 0


def test_ktx2_roundtrip(rng):
    img = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    out = decode_ktx2(encode_ktx2_rgba8(img))
    np.testing.assert_array_equal(out, img)


def test_ktx2_zlib_supercompression(rng):
    """KTX2 with ZLIB supercompression (scheme 3) decodes."""
    import struct
    import zlib

    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    plain = encode_ktx2_rgba8(img)
    # Rewrite: compress the payload, set supercompressionScheme=3.
    header = bytearray(plain[: 12 + 36])
    struct.pack_into("<I", header, 12 + 32, 3)  # 9th u32 field = scheme
    payload = img.tobytes()
    comp = zlib.compress(payload)
    index_fixed = struct.pack("<2I2I2Q", 0, 0, 0, 0, 0, 0)
    data_offset = len(header) + len(index_fixed) + 24
    level_index = struct.pack("<3Q", data_offset, len(comp), len(payload))
    data = bytes(header) + index_fixed + level_index + comp
    np.testing.assert_array_equal(decode_ktx2(data), img)


def test_ktx2_basislz_without_sgd_rejected(rng):
    # A scheme-1 file with no supercompressionGlobalData is malformed
    # (real BasisLZ now decodes — tests/test_etc1s.py); it must fail
    # loudly, not misdecode.
    import struct

    img = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    plain = bytearray(encode_ktx2_rgba8(img))
    struct.pack_into("<I", plain, 12 + 32, 1)  # BasisLZ
    with pytest.raises(ValueError, match="supercompressionGlobalData"):
        decode_ktx2(bytes(plain))


def test_ktx2_uastc_rejected(rng):
    # vkFormat UNDEFINED without BasisLZ = UASTC: clear gate.
    import struct

    img = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    plain = bytearray(encode_ktx2_rgba8(img))
    struct.pack_into("<I", plain, 12, 0)  # vkFormat = UNDEFINED
    with pytest.raises(NotImplementedError, match="UASTC"):
        decode_ktx2(bytes(plain))


def test_image_importer_dispatch(data_dir, tmp_path, rng):
    imp = AssetImporter()
    img = imp.image_importer.import_image(os.path.join(data_dir, "cube.png"))
    assert img.shape[2] == 4
    ktx_path = str(tmp_path / "t.ktx2")
    ref = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    with open(ktx_path, "wb") as f:
        f.write(encode_ktx2_rgba8(ref))
    np.testing.assert_array_equal(imp.image_importer.import_image(ktx_path), ref)


def _raw_two_meshes():
    """Two raw meshes sharing flat pools (the GeometryConfig contract,
    reference src/mgr.cpp:220-231 slicing)."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5], [6, 5, 5], [5, 6, 5], [6, 6, 5]],
        np.float32,
    )
    uvs = np.zeros((7, 2), np.float32)
    indices = np.array([0, 1, 2, 0, 1, 2, 1, 3, 2], np.uint32)
    return GeometryConfig(
        vertices=verts,
        uvs=uvs,
        indices=indices,
        mesh_vertex_offsets=np.array([0, 3], np.uint32),
        mesh_index_offsets=np.array([0, 3], np.uint32),
        mesh_materials=np.array([-1, 0], np.int32),
    )


def test_raw_geometry_slicing():
    objs = import_raw_geometry(_raw_two_meshes())
    assert len(objs) == 2
    m0, m1 = objs[0].meshes[0], objs[1].meshes[0]
    assert m0.num_vertices == 3 and m0.num_faces == 1
    assert m1.num_vertices == 4 and m1.num_faces == 2
    # Second mesh's indices are local to its vertex slice.
    assert m1.indices.max() < m1.num_vertices
    np.testing.assert_array_equal(m1.positions[0], [5, 5, 5])


def test_merge_ordering_and_offsets(data_dir):
    """Disk assets come first, raw meshes after (scripts/test.py:7-9);
    additional material texture ids are offset past asset textures
    (src/mgr.cpp:316-337); raw-mesh material ids resolve into the
    additional-material range."""
    merged = load_render_assets(
        _raw_two_meshes(),
        [ImportedAsset(path=os.path.join(data_dir, "cube.obj"), mat_id=-1)],
        [AdditionalMaterial(color=(1, 0, 0, 1), texture_id=0)],
        [os.path.join(data_dir, "cube.png")],
    )
    # objects: cube, raw0, raw1
    assert len(merged.objects) == 3
    assert sum(m.num_faces for m in merged.objects[0].meshes) == 12
    # materials: [cube.mtl material, additional]
    assert len(merged.materials) == 2
    # The additional material's texture id points at the appended texture,
    # not the asset's (both paths are cube.png here → interned to one slot).
    add_mat = merged.materials[1]
    assert add_mat.texture_id == 0  # deduped with the asset texture
    assert np.allclose(add_mat.color, (1, 0, 0, 1))
    # raw mesh 1 had material 0 → global index 1 (offset past 1 asset mat).
    assert merged.objects[2].meshes[0].material_idx == 1
    assert merged.objects[1].meshes[0].material_idx == -1


def test_asset_mat_override(data_dir):
    merged = load_render_assets(
        GeometryConfig.empty(),
        [ImportedAsset(path=os.path.join(data_dir, "cube.obj"), mat_id=0)],
        [AdditionalMaterial(color=(0, 1, 0, 1), texture_id=-1)],
        [],
    )
    # Override applied: cube meshes point at the additional material.
    assert merged.objects[0].meshes[0].material_idx == 1


def test_missing_asset_raises():
    with pytest.raises(FileNotFoundError):
        load_render_assets(GeometryConfig.empty(), [ImportedAsset("/nope.obj")], [], [])


def test_png_hostile_dimensions_fail_fast(rng):
    """A byte-flipped IHDR declaring huge dimensions must raise cleanly
    and FAST in every tier — the decode buffers are sized from the
    declared header, so an unbounded header is an OOM DoS, not a parse
    error (the cause of a 600s fuzz-driver stall this round)."""
    import struct
    import time

    from madrona_renderer_tpu import native
    from madrona_renderer_tpu.assets.png import decode_png, encode_png

    base = bytearray(encode_png(
        rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)))
    if native.available():
        # Warm the tier outside the timed section: the on-demand g++
        # build of a changed native source takes tens of seconds.
        native.decode_png_native(bytes(base))
    # IHDR body starts at byte 16: width/height as big-endian u32.
    for w, h in [(1 << 30, 8), (8, 1 << 30), (1 << 16, 1 << 16),
                 (0xFFFFFFFF, 0xFFFFFFFF)]:
        data = bytearray(base)
        data[16:24] = struct.pack(">II", w, h)
        t0 = time.monotonic()
        with pytest.raises(ValueError):
            decode_png(bytes(data))
        if native.available():
            with pytest.raises(ValueError):
                native.decode_png_native(bytes(data))
        assert time.monotonic() - t0 < 5.0


def test_png_zlib_bomb_bounded(rng):
    """IDAT that inflates far beyond the declared dimensions must be
    rejected without materializing the inflated stream."""
    import struct
    import zlib

    from madrona_renderer_tpu.assets.png import decode_png, encode_png

    base = encode_png(rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8))
    # Rebuild with a bomb IDAT: 64MB of zeros compresses to ~64KB.
    bomb = zlib.compress(b"\0" * (64 << 20), 9)

    def chunk(ctype, body):
        c = struct.pack(">I", len(body)) + ctype + body
        return c + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    ihdr = base[8:8 + 25]  # signature-stripped IHDR chunk (len 13 + 12)
    data = base[:8] + ihdr + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflates beyond"):
        decode_png(data)
