"""Native importer library: build-on-demand + ctypes bindings.

The shared library is compiled from ``importer.cpp`` on first use (g++,
links system zlib) into the package directory and cached. Everything here
degrades gracefully: if the toolchain or zlib is missing, callers fall back
to the pure-Python importers (set ``MRT_NATIVE=0`` to force the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "importer.cpp")
_SRC_ETC1S = os.path.join(_THIS_DIR, "etc1s.cpp")
_LIB = os.path.join(_THIS_DIR, f"_mrt_native_{sys.implementation.cache_tag}.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, _SRC_ETC1S, "-o", _LIB, "-lz",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_LIB)
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if os.environ.get("MRT_NATIVE", "1") == "0":
        return None
    try:
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_ETC1S))
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.mrt_obj_parse.restype = ctypes.c_void_p
    lib.mrt_obj_parse.argtypes = [ctypes.c_char_p]
    lib.mrt_obj_error.restype = ctypes.c_char_p
    lib.mrt_obj_error.argtypes = [ctypes.c_void_p]
    lib.mrt_obj_free.argtypes = [ctypes.c_void_p]
    lib.mrt_obj_num_meshes.restype = ctypes.c_int
    lib.mrt_obj_num_meshes.argtypes = [ctypes.c_void_p]
    lib.mrt_obj_mesh_info.argtypes = [ctypes.c_void_p, ctypes.c_int] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 5
    lib.mrt_obj_mesh_data.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.mrt_obj_num_materials.restype = ctypes.c_int
    lib.mrt_obj_num_materials.argtypes = [ctypes.c_void_p]
    lib.mrt_obj_material.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_int,
    ]
    lib.mrt_png_size.restype = ctypes.c_int
    lib.mrt_png_size.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mrt_png_decode.restype = ctypes.c_int
    lib.mrt_png_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.mrt_basislz_decode.restype = ctypes.c_int
    lib.mrt_basislz_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mrt_basislz_error.restype = ctypes.c_char_p
    lib.mrt_basislz_error.argtypes = []
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def parse_obj_native(path: str):
    """Native OBJ parse → SourceObject (same semantics as assets/obj.py)."""
    from ..assets.obj import SourceMaterial, SourceMesh, SourceObject

    lib = load()
    assert lib is not None
    h = lib.mrt_obj_parse(path.encode())
    if not h:
        raise MemoryError("obj_parse failed")
    try:
        err = lib.mrt_obj_error(h)
        if err:
            msg = err.decode()
            # Python-parser parity: file-content errors raise ValueError
            # (assets/obj.py's int() on a bad face token), missing files
            # raise FileNotFoundError.
            if msg.startswith("cannot open"):
                raise FileNotFoundError(msg)
            raise ValueError(msg)
        obj = SourceObject()
        buf = ctypes.create_string_buffer(1024)
        for i in range(lib.mrt_obj_num_materials(h)):
            color = (ctypes.c_float * 4)()
            rough = ctypes.c_float()
            metal = ctypes.c_float()
            lib.mrt_obj_material(h, i, color, ctypes.byref(rough), ctypes.byref(metal), buf, 1024)
            tex = buf.value.decode() or None
            obj.materials.append(
                SourceMaterial(
                    color=tuple(color), texture_path=tex,
                    roughness=rough.value, metalness=metal.value,
                )
            )
        for i in range(lib.mrt_obj_num_meshes(h)):
            nv = ctypes.c_int(); ni = ctypes.c_int(); mi = ctypes.c_int()
            huv = ctypes.c_int(); hn = ctypes.c_int()
            lib.mrt_obj_mesh_info(h, i, nv, ni, mi, huv, hn)
            pos = np.zeros((nv.value, 3), np.float32)
            uv = np.zeros((nv.value, 2), np.float32) if huv.value else None
            nrm = np.zeros((nv.value, 3), np.float32) if hn.value else None
            idx = np.zeros((ni.value,), np.uint32)
            lib.mrt_obj_mesh_data(
                h, i,
                pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if uv is not None else None,
                nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if nrm is not None else None,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            obj.meshes.append(
                SourceMesh(positions=pos, uvs=uv, normals=nrm, indices=idx,
                           material_idx=mi.value)
            )
        return obj
    finally:
        lib.mrt_obj_free(h)


def decode_png_native(data: bytes) -> np.ndarray:
    lib = load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.mrt_png_size(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("not a PNG file")
    out = np.zeros((h.value, w.value, 4), np.uint8)
    rc = lib.mrt_png_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.value, h.value,
    )
    if rc == -2:
        raise ValueError("PNG decode failed: dimensions differ from header probe")
    if rc != 0:
        raise ValueError("PNG decode failed (unsupported variant?)")
    return out


def decode_basislz_native(
    sgd: bytes, level: bytes, width: int, height: int
) -> np.ndarray:
    """Decode a KTX2 BasisLZ (ETC1S) image → RGBA8 [H, W, 4] via the
    native decoder (etc1s.cpp). Raises NotImplementedError for features
    outside the decoder's documented subset, ValueError for corrupt data."""
    lib = load()
    assert lib is not None
    out = np.zeros((height, width, 4), np.uint8)
    rc = lib.mrt_basislz_decode(
        sgd, len(sgd), level, len(level), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        err = lib.mrt_basislz_error()
        msg = err.decode() if err else "BasisLZ decode failed"
        if "not supported" in msg:
            raise NotImplementedError(f"KTX2 BasisLZ: {msg}")
        raise ValueError(f"KTX2 BasisLZ: {msg}")
    return out
