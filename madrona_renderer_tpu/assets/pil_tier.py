"""Pillow-backed image decode tier for formats outside the
self-contained PNG/KTX2 decoders.

JPEG is *core* glTF 2.0 (`image/jpeg` is a mandatory mimeType alongside
`image/png`), and the reference's asset path accepts whatever its
engine importer's stb-style handlers decode (`src/mgr.cpp:294-303`
ImageImporter with pluggable handlers). Our PNG and KTX2 decoders are
self-contained (pure Python / native C++); for JPEG and the long tail
(BMP, TGA, WebP) we delegate to Pillow when it is importable and raise
a loud, named error when it is not — never a silent wrong decode.
"""

from __future__ import annotations

import io

import numpy as np


def pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_pil(data: bytes) -> np.ndarray:
    """Decode image bytes → RGBA8 [H, W, 4] via Pillow."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "decoding this image format requires Pillow, which is not "
            "available in this runtime (PNG and KTX2 decode natively)"
        ) from e
    with Image.open(io.BytesIO(data)) as img:
        return np.asarray(img.convert("RGBA"), np.uint8)
