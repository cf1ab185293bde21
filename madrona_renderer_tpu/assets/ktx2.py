"""KTX2 texture container reader.

The reference plugs a KTX2 handler into its image importer and transcodes to
BC7 blocks for GPU sampling (reference ``src/mgr.cpp:199-212,297-298`` via
``ktx::loadKTXMem``). TPUs have no block-compression sampler, so our bake
target is raw RGBA8 texels instead (documented divergence; same role in the
pipeline: ``.ktx2`` files are accepted wherever texture paths are).

Supported: uncompressed R8/RG8/RGB8/RGBA8 (UNORM/SRGB) payloads with no
supercompression, ZLIB supercompression, Zstandard when the Python runtime
ships a zstd module, and BasisLZ (ETC1S) via the native C++ decoder
(native/etc1s.cpp — see its header for format provenance; streams using
features outside its documented subset fail loudly). UASTC payloads raise
a clear NotImplementedError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_KTX2_MAGIC = b"\xabKTX 20\xbb\r\n\x1a\n"

# VkFormat values → (channels, srgb)
_VK_FORMATS = {
    9: (1, False),  # R8_UNORM
    15: (1, True),  # R8_SRGB
    16: (2, False),  # R8G8_UNORM
    22: (2, True),  # R8G8_SRGB
    23: (3, False),  # R8G8B8_UNORM
    29: (3, True),  # R8G8B8_SRGB
    37: (4, False),  # R8G8B8A8_UNORM
    43: (4, True),  # R8G8B8A8_SRGB
}

# VkFormat VK_FORMAT_ASTC_{W}x{H}_{UNORM,SRGB}_BLOCK → (block_w, block_h).
# 157 = ASTC_4x4_UNORM; UNORM/SRGB alternate upward through 12x12.
_ASTC_BLOCK_DIMS = [
    (4, 4), (5, 4), (5, 5), (6, 5), (6, 6), (8, 5), (8, 6), (8, 8),
    (10, 5), (10, 6), (10, 8), (10, 10), (12, 10), (12, 12),
]
_VK_ASTC_FORMATS = {}
for _i, (_bw, _bh) in enumerate(_ASTC_BLOCK_DIMS):
    _VK_ASTC_FORMATS[157 + 2 * _i] = (_bw, _bh, False)
    _VK_ASTC_FORMATS[158 + 2 * _i] = (_bw, _bh, True)


def _zstd_decompress(data: bytes, expected: int) -> bytes:
    try:  # Python >= 3.14
        from compression import zstd  # type: ignore

        return zstd.decompress(data)
    except ImportError:
        pass
    try:
        import zstandard  # type: ignore

        return zstandard.ZstdDecompressor().decompress(data, max_output_size=expected)
    except ImportError as e:
        raise NotImplementedError(
            "KTX2: Zstandard supercompression requires a zstd module, "
            "which is not available in this runtime"
        ) from e


class MipChain:
    """An author-provided mip pyramid from a container (level 0 first).

    bake_scene uses these levels verbatim instead of regenerating them
    by box filter (libktx uploads the file's own levels the same way,
    reference ``src/mgr.cpp:199-212``); consumers that only want the
    base image read ``.base``.
    """

    def __init__(self, levels: list):
        assert levels
        self.levels = list(levels)

    @property
    def base(self) -> np.ndarray:
        return self.levels[0]

    @property
    def shape(self):
        return self.base.shape


def decode_ktx2(data: bytes, all_levels: bool = False):
    """Decode KTX2 bytes → RGBA8 [H, W, 4] (base level), or — with
    ``all_levels=True`` and a multi-level file — a MipChain of every
    stored level (BasisLZ files stay base-only: their slice streams are
    per-image, outside the documented subset)."""
    if data[:12] != _KTX2_MAGIC:
        raise ValueError("not a KTX2 file")
    if len(data) < 12 + 36 + 32 + 24:
        raise ValueError("truncated KTX2 file")
    (
        vk_format,
        _type_size,
        width,
        height,
        _depth,
        _layers,
        _faces,
        level_count,
        supercompression,
    ) = struct.unpack_from("<9I", data, 12)
    # Hostile-dimension guard: a corrupt header must fail loudly here,
    # not overflow a downstream allocation or native int (fuzz-found).
    if width == 0 or width > 1 << 16 or height > 1 << 16:
        raise ValueError(f"KTX2: implausible dimensions {width}x{height}")
    if width * max(height, 1) > 1 << 26:
        raise ValueError("KTX2: image exceeds the 64M-texel bound")
    # Index: dfd / kvd (u32 offset+length each), sgd (u64 offset+length)
    # then levelCount * (u64 byteOffset, byteLength, uncompressedByteLength).
    level_index_off = 12 + 36 + 2 * 4 + 2 * 4 + 2 * 8
    levels = max(level_count, 1)
    if len(data) < level_index_off + 24 * levels:
        raise ValueError("truncated KTX2 file (level index)")
    level0 = struct.unpack_from("<3Q", data, level_index_off)
    byte_offset, byte_length, uncompressed_length = level0
    # Bounds-check byte ranges before slicing: Python slices silently
    # truncate, which would surface a corrupt file as an opaque downstream
    # decode error (or empty buffers for a bogus huge offset).
    if byte_offset + byte_length > len(data):
        raise ValueError("truncated KTX2 file (level data out of range)")

    if supercompression == 1:
        # BasisLZ (ETC1S): decode via the native C++ transcoder straight
        # to RGBA8 (the reference transcodes to BC7 via libktx,
        # src/mgr.cpp:199-212; TPUs sample raw texels instead).
        sgd_offset, sgd_length = struct.unpack_from("<2Q", data, 12 + 36 + 16)
        if sgd_length == 0:
            raise ValueError("KTX2: BasisLZ without supercompressionGlobalData")
        if sgd_offset + sgd_length > len(data):
            raise ValueError("truncated KTX2 file (global data out of range)")
        from ..native import available, decode_basislz_native

        if not available():
            raise NotImplementedError(
                "KTX2: BasisLZ decoding needs the native library "
                "(native/etc1s.cpp) — build toolchain unavailable and no "
                "pure-Python fallback is provided"
            )
        return decode_basislz_native(
            bytes(data[sgd_offset : sgd_offset + sgd_length]),
            bytes(data[byte_offset : byte_offset + byte_length]),
            width,
            height or 1,
        )

    def decode_level(level: int) -> np.ndarray:
        lw = max(width >> level, 1)
        lh = max((height or 1) >> level, 1)
        off, length, unc = struct.unpack_from(
            "<3Q", data, level_index_off + 24 * level)
        if off + length > len(data):
            raise ValueError(
                f"truncated KTX2 file (level {level} data out of range)")
        payload = data[off : off + length]
        if supercompression == 2:
            payload = _zstd_decompress(payload, unc or (lw * lh * 4))
        elif supercompression == 3:
            payload = zlib.decompress(payload)
        elif supercompression != 0:
            raise NotImplementedError(
                f"KTX2: supercompression scheme {supercompression}")

        if vk_format in _VK_ASTC_FORMATS:
            # Standard ASTC payload: decode with the spec-derived LDR
            # block decoder (the reference accepts ASTC KTX2 through
            # libktx the same way, src/mgr.cpp:199-212; our bake target
            # is raw RGBA8). The native twin (astc.cpp) is preferred —
            # CI differential-fuzzes it bitwise against the Python tier.
            bw, bh, srgb = _VK_ASTC_FORMATS[vk_format]
            from ..native import available, decode_astc_native

            if available():
                return decode_astc_native(payload, lw, lh, bw, bh, srgb)
            from .astc import decode_astc_image

            return decode_astc_image(payload, lw, lh, bw, bh, srgb)
        if vk_format == 0:
            # vkFormat UNDEFINED without BasisLZ = UASTC (DFD 166).
            # sRGB-ness lives in the DFD transferFunction byte (vkFormat
            # carries no UNORM/SRGB split here): basic-DFD byte 2 of the
            # first block body, KHR_DF_TRANSFER_SRGB = 2.
            dfd_off, dfd_len = struct.unpack_from("<2I", data, 12 + 36)
            srgb = (
                dfd_len >= 16
                and dfd_off + 15 <= len(data)
                and data[dfd_off + 14] == 2
            )
            from .uastc import decode_uastc_image

            return decode_uastc_image(payload, lw, lh, srgb=srgb)
        if vk_format not in _VK_FORMATS:
            raise NotImplementedError(
                f"KTX2: VkFormat {vk_format} not supported "
                "(need 8-bit UNORM/SRGB, ASTC, UASTC, or BasisLZ)"
            )
        channels, _srgb = _VK_FORMATS[vk_format]
        img = np.frombuffer(payload, np.uint8)[: lw * lh * channels]
        if img.size < lw * lh * channels:
            raise ValueError(f"truncated KTX2 level {level} payload")
        img = img.reshape(lh, lw, channels)
        out = np.zeros((lh, lw, 4), np.uint8)
        out[..., 3] = 255
        if channels == 1:
            out[..., 0] = out[..., 1] = out[..., 2] = img[..., 0]
        elif channels == 2:
            out[..., 0] = out[..., 1] = out[..., 2] = img[..., 0]
            out[..., 3] = img[..., 1]
        else:
            out[..., :channels] = img
        return out

    base = decode_level(0)
    if not all_levels or levels == 1:
        return base
    return MipChain([base] + [decode_level(l) for l in range(1, levels)])


def read_ktx2(path: str, all_levels: bool = False):
    with open(path, "rb") as f:
        return decode_ktx2(f.read(), all_levels=all_levels)


def encode_ktx2_rgba8_mips(levels: list, srgb: bool = False) -> bytes:
    """Encode an explicit RGBA8 mip pyramid (level 0 first) into a
    multi-level KTX2 container (fixture writer; no supercompression)."""
    imgs = [np.ascontiguousarray(np.asarray(im, np.uint8)) for im in levels]
    h, w, c = imgs[0].shape
    assert c == 4
    vk_format = 43 if srgb else 37
    header = _KTX2_MAGIC + struct.pack(
        "<9I", vk_format, 1, w, h, 0, 0, 1, len(imgs), 0
    )
    index_fixed = struct.pack("<2I2I2Q", 0, 0, 0, 0, 0, 0)
    data_offset = len(header) + len(index_fixed) + 24 * len(imgs)
    level_index = b""
    payloads = b""
    off = data_offset
    for im in imgs:
        p = im.tobytes()
        level_index += struct.pack("<3Q", off, len(p), len(p))
        payloads += p
        off += len(p)
    return header + index_fixed + level_index + payloads


def encode_ktx2_payload(payload: bytes, width: int, height: int,
                        vk_format: int) -> bytes:
    """Wrap a pre-encoded level-0 payload (ASTC/UASTC blocks, raw texels)
    in a minimal single-level KTX2 container (fixture writer for tests;
    vk_format 0 = UASTC per the KTX2 convention)."""
    header = _KTX2_MAGIC + struct.pack(
        "<9I", vk_format, 1, width, height, 0, 0, 1, 1, 0
    )
    index_fixed = struct.pack("<2I2I2Q", 0, 0, 0, 0, 0, 0)
    data_offset = len(header) + len(index_fixed) + 24
    level_index = struct.pack("<3Q", data_offset, len(payload), len(payload))
    return header + index_fixed + level_index + payload


def encode_ktx2_rgba8(image: np.ndarray, srgb: bool = False) -> bytes:
    """Encode RGBA8 [H, W, 4] → minimal single-level KTX2 (no supercompression).

    Used by tests/tools to produce fixtures exercising the KTX2 input path
    (the reference repo ships no .ktx2 fixture; its handler is registered at
    ``src/mgr.cpp:297-298``).
    """
    img = np.ascontiguousarray(np.asarray(image, np.uint8))
    h, w, c = img.shape
    assert c == 4, "encode_ktx2_rgba8 expects RGBA"
    vk_format = 43 if srgb else 37
    header = _KTX2_MAGIC + struct.pack(
        "<9I", vk_format, 1, w, h, 0, 0, 1, 1, 0
    )
    # Minimal empty DFD/KVD/SGD; one level index entry.
    index_fixed = struct.pack("<2I2I2Q", 0, 0, 0, 0, 0, 0)
    level_index_size = 24
    data_offset = len(header) + len(index_fixed) + level_index_size
    payload = img.tobytes()
    level_index = struct.pack("<3Q", data_offset, len(payload), len(payload))
    return header + index_fixed + level_index + payload
