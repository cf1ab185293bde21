"""Pillow image tier: JPEG (core glTF mimeType) and long-tail formats
decode through assets/pil_tier.py — via the ImageImporter extension
dispatch and as glTF embedded images."""

import io

import numpy as np
import pytest

pytest.importorskip("PIL")

from madrona_renderer_tpu.assets.importer import ImageImporter
from madrona_renderer_tpu.assets.pil_tier import decode_pil


def _flat_jpeg(color=(200, 64, 32), size=16) -> bytes:
    from PIL import Image

    img = Image.new("RGB", (size, size), color)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    return buf.getvalue()


def test_decode_pil_jpeg_roundtrip():
    data = _flat_jpeg()
    out = decode_pil(data)
    assert out.shape == (16, 16, 4) and out.dtype == np.uint8
    # Flat-color JPEG at q95: within a few LSB of the source color.
    assert np.abs(out[..., :3].astype(int) - [200, 64, 32]).max() <= 6
    assert (out[..., 3] == 255).all()


def test_image_importer_dispatches_jpeg(tmp_path):
    p = tmp_path / "t.jpg"
    p.write_bytes(_flat_jpeg())
    out = ImageImporter().import_image(str(p))
    assert out.shape == (16, 16, 4)


def test_gltf_embedded_jpeg(tmp_path):
    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb
    from madrona_renderer_tpu.assets.gltf import parse_gltf

    blob, views, accessors, _, _ = _accessor_blob()
    jpg = _flat_jpeg()
    img_off = len(blob) + (-len(blob) % 4)
    blob = blob + b"\0" * (-len(blob) % 4) + jpg
    gltf = _base_gltf(views, accessors)
    gltf["bufferViews"].append(
        {"buffer": 0, "byteOffset": img_off, "byteLength": len(jpg)}
    )
    gltf["buffers"] = [{"byteLength": len(blob)}]
    gltf["images"] = [{"bufferView": 4, "mimeType": "image/jpeg"}]
    gltf["textures"] = [{"source": 0}]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    path = str(tmp_path / "tex_jpeg.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    obj = parse_gltf(path)
    tex = obj.materials[0].texture_image
    assert tex.shape == (16, 16, 4)
    assert np.abs(tex[..., :3].astype(int) - [200, 64, 32]).max() <= 6


def test_gltf_garbage_image_raises(tmp_path):
    from tests.test_gltf import _accessor_blob, _base_gltf, _make_glb
    from madrona_renderer_tpu.assets.gltf import parse_gltf

    blob, views, accessors, _, _ = _accessor_blob()
    junk = b"\xde\xad\xbe\xef" * 8
    img_off = len(blob) + (-len(blob) % 4)
    blob = blob + b"\0" * (-len(blob) % 4) + junk
    gltf = _base_gltf(views, accessors)
    gltf["bufferViews"].append(
        {"buffer": 0, "byteOffset": img_off, "byteLength": len(junk)}
    )
    gltf["buffers"] = [{"byteLength": len(blob)}]
    gltf["images"] = [{"bufferView": 4}]
    gltf["textures"] = [{"source": 0}]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    path = str(tmp_path / "junk.glb")
    with open(path, "wb") as f:
        f.write(_make_glb(gltf, blob))
    with pytest.raises((ValueError, NotImplementedError)):
        parse_gltf(path)
