"""Native C++ importer ↔ pure-Python parity (same files, identical output)."""

import os

import numpy as np
import pytest

from madrona_renderer_tpu import native
from madrona_renderer_tpu.assets.obj import parse_obj
from madrona_renderer_tpu.assets.png import decode_png, encode_png

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

REFERENCE_DATA = "/root/reference/data"


def _assert_obj_equal(a, b):
    assert len(a.meshes) == len(b.meshes)
    assert len(a.materials) == len(b.materials)
    for ma, mb in zip(a.meshes, b.meshes):
        np.testing.assert_allclose(ma.positions, mb.positions, rtol=1e-6)
        np.testing.assert_array_equal(ma.indices, mb.indices)
        assert ma.material_idx == mb.material_idx
        assert (ma.uvs is None) == (mb.uvs is None)
        if ma.uvs is not None:
            np.testing.assert_allclose(ma.uvs, mb.uvs, rtol=1e-6)
        assert (ma.normals is None) == (mb.normals is None)
        if ma.normals is not None:
            np.testing.assert_allclose(ma.normals, mb.normals, rtol=1e-6)
    for xa, xb in zip(a.materials, b.materials):
        np.testing.assert_allclose(xa.color, xb.color, rtol=1e-6)
        assert xa.texture_path == xb.texture_path
        assert xa.roughness == pytest.approx(xb.roughness)


def test_obj_parity_fixture(data_dir):
    path = os.path.join(data_dir, "cube.obj")
    _assert_obj_equal(native.parse_obj_native(path), parse_obj(path))


@pytest.mark.parametrize("face,what", [
    ("f 5 2 3", "vertex"),        # v index past the 3 declared
    ("f 1/9 2/1 3/1", "texcoord"),  # vt index past the 1 declared
    ("f 1//9 2//1 3//1", "normal"),  # vn index past the 1 declared
    ("f -9 2 3", "vertex"),       # relative index beyond depth → negative
])
def test_obj_out_of_range_indices_both_tiers(tmp_path, face, what):
    """Out-of-range face indices are a loud ValueError in BOTH parser
    tiers — for vertex, texcoord, and normal indices alike (the native
    tier used to zero-fill vt/vn silently; Python raised an accidental
    IndexError)."""
    p = tmp_path / "oob.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvn 0 0 1\n" + face + "\n"
    )
    with pytest.raises(ValueError, match="out of range"):
        parse_obj(str(p))
    with pytest.raises(ValueError, match="out of range"):
        native.parse_obj_native(str(p))


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference data absent")
@pytest.mark.parametrize("name", ["cube.obj", "plane.obj", "wall_render.obj"])
def test_obj_parity_reference_assets(name):
    path = os.path.join(REFERENCE_DATA, name)
    _assert_obj_equal(native.parse_obj_native(path), parse_obj(path))


def test_png_parity_random(rng):
    img = rng.integers(0, 256, size=(33, 47, 4), dtype=np.uint8)
    data = encode_png(img)
    np.testing.assert_array_equal(native.decode_png_native(data), decode_png(data))


def test_png_parity_rgb_gray(rng):
    for c in (1, 3):
        shape = (12, 9) if c == 1 else (12, 9, 3)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        data = encode_png(img)
        np.testing.assert_array_equal(native.decode_png_native(data), decode_png(data))


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DATA, "cube.png")),
    reason="reference data absent",
)
def test_png_parity_reference_texture():
    with open(os.path.join(REFERENCE_DATA, "cube.png"), "rb") as f:
        data = f.read()
    np.testing.assert_array_equal(native.decode_png_native(data), decode_png(data))


def test_native_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        native.parse_obj_native("/nope/missing.obj")


def test_native_png_garbage():
    with pytest.raises(ValueError):
        native.decode_png_native(b"garbage")


def test_native_png_duplicate_ihdr_no_overflow():
    """ADVICE r1 (high): a crafted PNG with a tiny first IHDR and a larger
    duplicate IHDR must not write past the caller's probe-sized buffer."""
    import struct
    import zlib

    def chunk(typ, body):
        c = struct.pack(">I", len(body)) + typ + body
        return c + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_small = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    ihdr_big = struct.pack(">IIBBBBB", 100, 100, 8, 6, 0, 0, 0)
    # Payload inflates to 100 rows of (1 filter byte + 100*4 px) zeros.
    raw = b"\x00" * (100 * (1 + 100 * 4))
    evil = (
        sig
        + chunk(b"IHDR", ihdr_small)
        + chunk(b"IHDR", ihdr_big)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    # First IHDR (1x1) wins; the 100x100 IDAT stream then fails the size
    # check inside the decoder. Either way: an exception, never a segfault.
    with pytest.raises(ValueError):
        native.decode_png_native(evil)
    from madrona_renderer_tpu.assets.png import decode_png as py_decode

    with pytest.raises(ValueError):
        py_decode(evil)


def test_native_obj_malformed_face_parity(tmp_path):
    """ADVICE r1 (medium): a malformed face token must terminate (was an
    infinite loop) and raise ValueError like the pure-Python parser."""
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 x\n")
    with pytest.raises(ValueError):
        native.parse_obj_native(str(p))
    with pytest.raises(ValueError):
        parse_obj(str(p))


# --- CPython extension tier (pymodule.cpp) -------------------------------

ext_only = pytest.mark.skipif(
    native.load_ext() is None, reason="extension module unavailable"
)


@ext_only
def test_ext_obj_matches_ctypes_and_python(data_dir, monkeypatch):
    path = os.path.join(data_dir, "cube.obj")
    via_ext = native._ext_parse_obj(path)
    _assert_obj_equal(via_ext, parse_obj(path))
    # And against the ctypes tier explicitly (force it).
    monkeypatch.setattr(native, "_ext", None)
    monkeypatch.setattr(native, "_ext_tried", True)
    _assert_obj_equal(via_ext, native.parse_obj_native(path))


@ext_only
def test_ext_error_types(tmp_path):
    ext = native.load_ext()
    with pytest.raises(FileNotFoundError):
        ext.obj_parse(str(tmp_path / "nope.obj"))
    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 x\n")
    with pytest.raises(ValueError):
        ext.obj_parse(str(bad))
    with pytest.raises(ValueError):
        ext.png_decode(b"not a png")
    with pytest.raises(ValueError):
        ext.basislz_decode(b"", b"", 4, 4)


@ext_only
def test_ext_png_roundtrip(rng):
    img = rng.integers(0, 256, size=(9, 13, 4), dtype=np.uint8)
    w, h, rgba = native.load_ext().png_decode(encode_png(img))
    got = np.frombuffer(rgba, np.uint8).reshape(h, w, 4)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("shape", [(16, 16, 4), (7, 5, 3), (9, 31, 1), (33, 2, 2), (1, 1, 4)])
def test_adam7_interlaced_parity(shape, rng):
    """Adam7-interlaced PNGs decode identically through the pure-Python
    and native decoders (and match the non-interlaced encoding)."""
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(img, interlace=True)
    expect = decode_png(encode_png(img))
    np.testing.assert_array_equal(decode_png(data), expect)
    np.testing.assert_array_equal(native.decode_png_native(data), expect)


def _glb_compare(pp, nn):
    assert len(pp.meshes) == len(nn.meshes)
    assert len(pp.materials) == len(nn.materials)
    for a, b in zip(pp.meshes, nn.meshes):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert (a.uvs is None) == (b.uvs is None)
        if a.uvs is not None:
            np.testing.assert_array_equal(a.uvs, b.uvs)
        assert (a.normals is None) == (b.normals is None)
        if a.normals is not None:
            # np.linalg.inv (LU) vs the native adjugate inverse differ by
            # double-ulps before the single f32 round.
            np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)
        assert a.material_idx == b.material_idx
    for a, b in zip(pp.materials, nn.materials):
        assert tuple(np.float32(a.color)) == tuple(np.float32(b.color))
        assert abs(a.roughness - b.roughness) < 1e-7
        assert abs(a.metalness - b.metalness) < 1e-7
        assert (a.texture_image is None) == (b.texture_image is None)
        if a.texture_image is not None:
            np.testing.assert_array_equal(a.texture_image, b.texture_image)


def test_gltf_native_parity(tmp_path, rng):
    """The C++ GLB parser (gltf.cpp — cgltf analog) matches the Python
    parser on base quads, TRS + matrix node hierarchies, embedded PNG
    textures, normalized/interleaved accessors, and falls back to the
    Python tier's loud gates on sparse accessors."""
    from madrona_renderer_tpu.assets.gltf import parse_gltf
    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb

    blob, views, accessors, _pos, _uvs = _accessor_blob()
    g = _base_gltf(views, accessors)
    p = str(tmp_path / "q.glb")
    with open(p, "wb") as f:
        f.write(_make_glb(g, blob))
    _glb_compare(parse_gltf(p), native.parse_gltf_native(p))

    g = _base_gltf(views, accessors)
    g["nodes"] = [
        {"children": [1],
         "matrix": [1, 0, 0, 0, 0, 0, 1, 0, 0, -1, 0, 0, 5, 6, 7, 1]},
        {"mesh": 0, "translation": [1, 2, 3],
         "rotation": [0.0, 0.0, 0.3826834, 0.9238795],
         "scale": [2, 1, 0.5]},
    ]
    g["scenes"] = [{"nodes": [0]}]
    p2 = str(tmp_path / "t.glb")
    with open(p2, "wb") as f:
        f.write(_make_glb(g, blob))
    _glb_compare(parse_gltf(p2), native.parse_gltf_native(p2))

    img = rng.integers(0, 255, size=(8, 8, 4), dtype=np.uint8)
    png = encode_png(np.asarray(img))
    pad = -len(blob) % 4
    blob2 = blob + b"\0" * pad + png
    g = _base_gltf(views, accessors)
    g["bufferViews"] = views + [
        {"buffer": 0, "byteOffset": len(blob) + pad, "byteLength": len(png)}
    ]
    g["buffers"] = [{"byteLength": len(blob2)}]
    g["images"] = [{"bufferView": 4, "mimeType": "image/png"}]
    g["textures"] = [{"source": 0}]
    g["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {
        "index": 0
    }
    p3 = str(tmp_path / "tex.glb")
    with open(p3, "wb") as f:
        f.write(_make_glb(g, blob2))
    _glb_compare(parse_gltf(p3), native.parse_gltf_native(p3))

    # Sparse accessors: the C++ tier gates them and falls back to the
    # Python parser, which decodes the substitution (glTF §3.6.2.3).
    sp_indices = np.array([0, 2], np.uint16)
    sp_values = np.array([[4.0, 4.0, 4.0], [-3.0, 1.5, 0.5]], np.float32)
    base_off = len(blob)
    blob4 = blob + sp_indices.tobytes() + sp_values.tobytes()
    g = _base_gltf(views, accessors)
    g["accessors"] = [dict(a) for a in accessors]
    g["bufferViews"] = list(views) + [
        {"buffer": 0, "byteOffset": base_off, "byteLength": 4},
        {"buffer": 0, "byteOffset": base_off + 4, "byteLength": 24},
    ]
    g["accessors"][0]["sparse"] = {
        "count": 2,
        "indices": {"bufferView": 4, "componentType": 5123},
        "values": {"bufferView": 5},
    }
    p4 = str(tmp_path / "s.glb")
    with open(p4, "wb") as f:
        f.write(_make_glb(g, blob4))
    got = native.parse_gltf_native(p4)
    _glb_compare(parse_gltf(p4), got)
    want = _pos.copy()
    want[sp_indices] = sp_values
    np.testing.assert_allclose(got.meshes[0].positions, want)


def test_gltf_native_missing_file():
    with pytest.raises(FileNotFoundError):
        native.parse_gltf_native("/nonexistent/file.glb")


@ext_only
def test_ext_gltf_matches_ctypes_and_python(tmp_path, rng, monkeypatch):
    """GLB through the extension tier == ctypes tier == Python parser,
    including embedded PNG textures."""
    from madrona_renderer_tpu.assets.gltf import parse_gltf
    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb

    blob, views, accessors, _pos, _uvs = _accessor_blob()
    img = rng.integers(0, 255, size=(8, 8, 4), dtype=np.uint8)
    png = encode_png(np.asarray(img))
    pad = -len(blob) % 4
    blob2 = blob + b"\0" * pad + png
    g = _base_gltf(views, accessors)
    g["bufferViews"] = views + [
        {"buffer": 0, "byteOffset": len(blob) + pad, "byteLength": len(png)}
    ]
    g["buffers"] = [{"byteLength": len(blob2)}]
    g["images"] = [{"bufferView": 4, "mimeType": "image/png"}]
    g["textures"] = [{"source": 0}]
    g["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {
        "index": 0
    }
    p = str(tmp_path / "tex.glb")
    with open(p, "wb") as f:
        f.write(_make_glb(g, blob2))
    via_ext = native._ext_parse_gltf(p)
    _glb_compare(parse_gltf(p), via_ext)
    monkeypatch.setattr(native, "_ext", None)
    monkeypatch.setattr(native, "_ext_tried", True)
    _glb_compare(via_ext, native.parse_gltf_native(p))
