"""BasisLZ / ETC1S KTX2: native decoder vs conforming encoder.

The reference accepts Basis-compressed KTX2 through libktx
(``/root/reference/src/mgr.cpp:199-212``); here the native C++ decoder
(native/etc1s.cpp) goes straight to RGBA8. The encoder
(assets/etc1s_encode.py) is this repo's fixture generator — no Basis
encoder exists in the sandbox (see etc1s.cpp's provenance note).
"""

import numpy as np
import pytest

from madrona_renderer_tpu.assets.etc1s_encode import (
    _INTEN,
    _encode_blocks,
    encode_ktx2_etc1s,
)
from madrona_renderer_tpu.assets.ktx2 import decode_ktx2
from madrona_renderer_tpu.native import available

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)


def _expected_decode(img: np.ndarray) -> np.ndarray:
    """Independent numpy ETC1S decode of the encoder's block choices —
    ground truth the native decoder must match bit-for-bit."""
    h, w = img.shape[:2]
    endpoints, selectors, block_ep, block_sel = _encode_blocks(img)
    out = np.zeros((h, w, 4), np.uint8)
    out[..., 3] = 255
    bh, bw = block_ep.shape
    for by in range(bh):
        for bx in range(bw):
            r5, g5, b5, inten = endpoints[block_ep[by, bx]]
            base = np.asarray(
                [(v << 3) | (v >> 2) for v in (r5, g5, b5)], np.int32
            )
            sel = selectors[block_sel[by, bx]]
            for py in range(4):
                y = by * 4 + py
                if y >= h:
                    break
                for px in range(4):
                    x = bx * 4 + px
                    if x >= w:
                        break
                    m = int(_INTEN[inten, sel[py * 4 + px]])
                    out[y, x, :3] = np.clip(base + m, 0, 255)
    return out


@pytest.mark.parametrize(
    "shape,seed",
    [((4, 4), 0), ((2, 3), 1), ((40, 56), 2), ((33, 100), 3), ((17, 5), 4)],
)
def test_decode_matches_ground_truth(shape, seed):
    h, w = shape
    rng = np.random.default_rng(seed)
    # Mix of gradients and noise so codebooks have many entries and all
    # three endpoint-prediction modes (left/above/explicit) occur.
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = (xx * 255 // max(w, 1)).astype(np.uint8)
    img[..., 1] = rng.integers(0, 256, (h, w)).astype(np.uint8)
    img[..., 2] = ((yy // 4) * 40 % 256).astype(np.uint8)
    img[..., 3] = 255
    out = decode_ktx2(encode_ktx2_etc1s(img))
    np.testing.assert_array_equal(out, _expected_decode(img))


def test_constant_image_single_symbol_tables():
    # One endpoint, one selector: exercises degenerate 1-symbol Huffman
    # tables end to end.
    img = np.full((8, 8, 4), 200, np.uint8)
    out = decode_ktx2(encode_ktx2_etc1s(img))
    np.testing.assert_array_equal(out, _expected_decode(img))
    assert np.abs(out[..., :3].astype(np.int16) - 200).max() <= 4


def test_lossy_but_close_on_smooth_content():
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = (xx * 255 // w).astype(np.uint8)
    img[..., 1] = (yy * 255 // h).astype(np.uint8)
    img[..., 2] = 90
    img[..., 3] = 255
    out = decode_ktx2(encode_ktx2_etc1s(img))
    err = np.abs(out[..., :3].astype(np.int16) - img[..., :3].astype(np.int16))
    assert err.mean() < 8, err.mean()


def test_corrupt_stream_fails_loudly():
    img = np.full((8, 8, 4), 99, np.uint8)
    data = bytearray(encode_ktx2_etc1s(img))
    data[-3] ^= 0xFF  # flip slice bits
    with pytest.raises((ValueError, NotImplementedError)):
        decode_ktx2(bytes(data))
    # Truncated sgd.
    with pytest.raises(ValueError):
        decode_ktx2(bytes(data[:90]))


def test_basis_ktx2_fixture_renders(tmp_path):
    """The VERDICT r1 #6 'Done' condition: a Basis-compressed KTX2 fixture
    loads through the texture path and renders."""
    from madrona_renderer_tpu.config import AdditionalMaterial, ImportedInstance
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_ref

    from tests.helpers import build, cam_at_origin_looking_plus_y, quad_uvs, quad_xz

    h, w = 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 0] = ((xx // 4 + yy // 4) % 2 * 255).astype(np.uint8)
    img[..., 1] = 60
    img[..., 2] = (yy * 255 // h).astype(np.uint8)
    img[..., 3] = 255
    path = str(tmp_path / "checker_basis.ktx2")
    with open(path, "wb") as f:
        f.write(encode_ktx2_etc1s(img))

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
    frames = rt_ref(state, scene, height=32, width=32)
    rgb = np.asarray(frames.rgb)
    assert (np.asarray(frames.segmask) >= 0).any(), "quad not visible"

    # Same scene with the decoded image as a PNG must render IDENTICALLY:
    # the KTX2/BasisLZ input path is a pure container difference.
    from madrona_renderer_tpu.assets.png import write_png

    decoded = decode_ktx2(encode_ktx2_etc1s(img))
    png_path = str(tmp_path / "checker_basis.png")
    write_png(png_path, decoded)
    state2, scene2 = build(
        [quad_xz(half=100.0, y=0.0)],
        [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        [cam_at_origin_looking_plus_y()],
        uvs=[quad_uvs()],
        mesh_materials=[0],
        additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1), texture_id=0)],
        additional_textures=[png_path],
    )
    frames2 = rt_ref(state2, scene2, height=32, width=32)
    np.testing.assert_array_equal(rgb, np.asarray(frames2.rgb))


def test_fuzz_mutations_never_crash():
    """Mutated BasisLZ streams must produce clean Python errors or valid
    decodes — never native crashes or unexpected exception types (the
    decoder parses untrusted files in C++)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    base = bytearray(encode_ktx2_etc1s(img))
    for _ in range(300):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            data[int(rng.integers(64, len(data)))] = int(rng.integers(0, 256))
        try:
            decode_ktx2(bytes(data))
        except (ValueError, NotImplementedError):
            pass
    for _ in range(50):
        n = int(rng.integers(100, 1500))
        data = bytes(base[:80]) + bytes(
            rng.integers(0, 256, n, dtype=np.uint8)
        )
        try:
            decode_ktx2(data)
        except (ValueError, NotImplementedError):
            pass
