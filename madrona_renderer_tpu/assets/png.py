"""Minimal PNG codec (pure Python + stdlib zlib, numpy in/out).

Fills the role of the engine's image importer / stb_image for the formats the
reference actually exercises: PNG texture decode (reference feeds
``data/cube.png`` through ``ImageImporter::importImage``, ``src/mgr.cpp:318``)
and PNG writing for the tiled frame dump (reference uses ``stbi_write_png``,
``src/dump.cpp:113-115``).

Decoder support: 8-bit and 16-bit gray / gray+alpha / RGB / RGBA / palette,
all 5 scanline filters, non-interlaced. Interlaced (Adam7) images raise.
Output is always RGBA8 [H, W, 4] — the bake target (TPUs sample raw texels;
there is no BC7 sampler, so unlike the reference we normalize everything to
RGBA8 at import time).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Channels per pixel for each PNG color type.
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. raw: [height * (1 + stride)] u8."""
    out = np.zeros((height, stride), np.uint8)
    pos = 0
    prev = np.zeros((stride,), np.uint8)
    for y in range(height):
        ftype = int(raw[pos])
        pos += 1
        line = raw[pos : pos + stride].astype(np.int32)
        pos += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            p = prev.astype(np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + p[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            p = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = p[x]
                c = p[x - bpp] if x >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → RGBA8 numpy array [H, W, 4]."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    width = height = 0
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette = None
    trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR" and width == 0:
            # Only the first IHDR counts (duplicate-IHDR guard, matching the
            # native decoder — a later IHDR must not redefine dimensions).
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if interlace:
        raise NotImplementedError("PNG: Adam7 interlacing not supported")
    if bit_depth not in (8, 16):
        raise NotImplementedError(f"PNG: bit depth {bit_depth} not supported")
    channels = _CHANNELS[color_type]
    bytes_per_sample = bit_depth // 8
    bpp = channels * bytes_per_sample
    stride = width * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError(
            f"PNG: IDAT stream inflates to {raw.size} bytes, header implies "
            f"{height * (stride + 1)}"
        )
    img = _unfilter(raw, height, stride, bpp)
    if bit_depth == 16:
        # Keep the high byte (same as stb's 16→8 reduction).
        img = img.reshape(height, width, channels, 2)[..., 0]
    else:
        img = img.reshape(height, width, channels)

    out = np.zeros((height, width, 4), np.uint8)
    out[..., 3] = 255
    if color_type == 0:  # gray
        out[..., 0] = out[..., 1] = out[..., 2] = img[..., 0]
    elif color_type == 2:  # RGB
        out[..., :3] = img
    elif color_type == 3:  # palette
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = img[..., 0]
        out[..., :3] = palette[idx]
        if trns is not None:
            alpha = np.full((len(palette),), 255, np.uint8)
            n = min(len(trns), len(palette))
            alpha[:n] = trns[:n]
            out[..., 3] = alpha[idx]
    elif color_type == 4:  # gray + alpha
        out[..., 0] = out[..., 1] = out[..., 2] = img[..., 0]
        out[..., 3] = img[..., 1]
    elif color_type == 6:  # RGBA
        out[...] = img
    else:
        raise ValueError(f"PNG: bad color type {color_type}")
    return out


def read_png(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_png(f.read())


def encode_png(image: np.ndarray) -> bytes:
    """Encode an RGBA8 / RGB8 / gray8 numpy image [H, W, C] or [H, W] to PNG."""
    img = np.asarray(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    # Filter type 0 on every scanline.
    raw = np.zeros((h, 1 + w * c), np.uint8)
    raw[:, 1:] = img.reshape(h, w * c)
    compressed = zlib.compress(raw.tobytes(), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", compressed)
        + chunk(b"IEND", b"")
    )


def write_png(path: str, image: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(image))
