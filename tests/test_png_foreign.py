"""Cross-validation of the self-contained PNG decoder against a foreign
encoder (Pillow). The in-repo encoder/decoder pair share one author, so
round-trip tests alone can't catch a shared misreading of the spec
(the concern VERDICT r2 raised for ETC1S); Pillow's zlib/filter choices
(optimize=True picks per-row filters) exercise decode paths our encoder
never emits."""

import io

import numpy as np
import pytest

pytest.importorskip("PIL")

from madrona_renderer_tpu.assets.png import decode_png


def _check(img, mode):
    buf = io.BytesIO()
    img.save(buf, "PNG", optimize=True)
    got = decode_png(buf.getvalue())
    want = np.asarray(img.convert("RGBA"), np.uint8)
    np.testing.assert_array_equal(got, want, err_msg=f"mode {mode}")


@pytest.mark.parametrize("mode,channels", [
    ("RGB", 3), ("RGBA", 4), ("L", 1), ("LA", 2),
])
@pytest.mark.parametrize("size", [(16, 16), (33, 17), (1, 1), (128, 3)])
def test_foreign_png_modes(mode, channels, size):
    from PIL import Image

    # zlib.crc32 keeps the per-case seed deterministic across processes
    # (builtin hash() is randomized by PYTHONHASHSEED).
    import zlib

    rng = np.random.default_rng(zlib.crc32(repr((mode, size)).encode()))
    shape = (size[1], size[0], channels) if channels > 1 else (size[1], size[0])
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    _check(Image.fromarray(arr, mode), mode)


def test_foreign_png_palette():
    from PIL import Image

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB").convert("P", palette=Image.ADAPTIVE)
    _check(img, "P")


def test_foreign_png_gradient_filters():
    """Smooth gradients drive optimize=True into Paeth/up/avg filters."""
    from PIL import Image

    y, x = np.mgrid[0:64, 0:64]
    arr = np.stack([x * 4, y * 4, (x + y) * 2], -1).astype(np.uint8)
    _check(Image.fromarray(arr, "RGB"), "gradient")


def test_pillow_reads_our_encoder():
    """Symmetric direction: a foreign decoder accepts our encoder's
    output bit-exactly."""
    from PIL import Image
    from madrona_renderer_tpu.assets.png import encode_png

    rng = np.random.default_rng(21)
    arr = rng.integers(0, 256, size=(27, 13, 4), dtype=np.uint8)
    data = encode_png(arr)
    with Image.open(io.BytesIO(data)) as img:
        np.testing.assert_array_equal(np.asarray(img.convert("RGBA")), arr)


def test_foreign_png_native_tier_matches():
    """The C++ decoder tier agrees with the Python one on foreign bytes."""
    from PIL import Image
    from madrona_renderer_tpu import native

    if not native.available():
        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(31, 19, 4), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, "PNG", optimize=True)
    np.testing.assert_array_equal(
        native.decode_png_native(buf.getvalue()), decode_png(buf.getvalue())
    )


def test_foreign_png_16bit_gray():
    from PIL import Image

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 65536, size=(20, 20), dtype=np.uint16)
    img = Image.fromarray(arr.astype(np.int32), "I").convert("I;16")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    got = decode_png(buf.getvalue())
    # 16-bit gray decodes via the high byte (decoder contract).
    want8 = (arr >> 8).astype(np.uint8)
    np.testing.assert_array_equal(got[..., 0], want8)
    np.testing.assert_array_equal(got[..., 3], 255)
