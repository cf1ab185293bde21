"""Native importer library: build-on-demand, three binding tiers.

The same C++ core (``importer.cpp`` + ``etc1s.cpp``) is exposed two ways,
preferred in this order, with pure-Python importers as the final tier:

1. **CPython extension module** (``pymodule.cpp`` → ``_mrt_ext``): the
   compiled-module analog of the reference's nanobind bindings
   (reference ``src/bindings.cpp``) — no per-call ctypes marshalling.
2. **ctypes** over a plain shared library — works without Python headers.
3. Pure Python (``assets/obj.py`` etc.) when no toolchain exists.

Both native tiers build on first use (g++, links system zlib) into the
package directory and are cached. Set ``MRT_NATIVE=0`` to force the pure
Python tier, ``MRT_NATIVE_EXT=0`` to skip the extension tier.
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
_SRC_PYMOD = os.path.join(_THIS_DIR, "pymodule.cpp")
_SRC_GLTF = os.path.join(_THIS_DIR, "gltf.cpp")
_SRC_ASTC = os.path.join(_THIS_DIR, "astc.cpp")
_HDR_COMMON = os.path.join(_THIS_DIR, "common.h")
_LIB = os.path.join(_THIS_DIR, f"_mrt_native_{sys.implementation.cache_tag}.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_ext = None
_ext_tried = False


def _ext_lib_path() -> str:
    import sysconfig

    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_THIS_DIR, f"_mrt_ext{suffix}")


def _build_ext() -> bool:
    import sysconfig

    out = _ext_lib_path()
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        _SRC_PYMOD, _SRC, _SRC_ETC1S, _SRC_GLTF, _SRC_ASTC, "-o", out, "-lz",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=180)
        return res.returncode == 0 and os.path.exists(out)
    except (OSError, subprocess.SubprocessError):
        return False


def load_ext():
    """Import (building if needed) the _mrt_ext extension module, or None."""
    global _ext, _ext_tried
    if _ext is not None:
        return _ext
    if _ext_tried:
        return None
    _ext_tried = True
    if os.environ.get("MRT_NATIVE", "1") == "0":
        return None
    if os.environ.get("MRT_NATIVE_EXT", "1") == "0":
        return None
    path = _ext_lib_path()
    try:
        srcs = (_SRC, _SRC_ETC1S, _SRC_PYMOD, _SRC_GLTF, _SRC_ASTC, _HDR_COMMON)
        src_mtime = max(os.path.getmtime(s) for s in srcs)
        if not os.path.exists(path) or os.path.getmtime(path) < src_mtime:
            if not _build_ext():
                return None
        import importlib.util

        spec = importlib.util.spec_from_file_location("_mrt_ext", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except (OSError, ImportError):
        return None
    _ext = mod
    return mod


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, _SRC_ETC1S, _SRC_GLTF, _SRC_ASTC, "-o", _LIB, "-lz",
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
        src_mtime = max(
            os.path.getmtime(_SRC), os.path.getmtime(_SRC_ETC1S),
            os.path.getmtime(_SRC_GLTF), os.path.getmtime(_SRC_ASTC),
            os.path.getmtime(_HDR_COMMON),
        )
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
    lib.mrt_gltf_parse.restype = ctypes.c_void_p
    lib.mrt_gltf_parse.argtypes = [ctypes.c_char_p]
    lib.mrt_gltf_material_image_info.restype = ctypes.c_int
    lib.mrt_gltf_material_image_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mrt_gltf_material_image.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
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
    lib.mrt_astc_decode.restype = ctypes.c_int
    lib.mrt_astc_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mrt_astc_error.restype = ctypes.c_char_p
    lib.mrt_astc_error.argtypes = []
    _lib = lib
    return lib


def available() -> bool:
    return load_ext() is not None or load() is not None


def _ext_parse_obj(path: str):
    from ..assets.obj import SourceMaterial, SourceMesh, SourceObject

    mats, meshes = _ext.obj_parse(path)
    obj = SourceObject()
    for m in mats:
        obj.materials.append(
            SourceMaterial(
                color=tuple(m["color"]), texture_path=m["texture_path"],
                roughness=m["roughness"], metalness=m["metalness"],
            )
        )
    for m in meshes:
        nv = m["num_vertices"]
        obj.meshes.append(
            SourceMesh(
                positions=np.frombuffer(m["positions"] or b"", np.float32).reshape(nv, 3),
                uvs=(
                    np.frombuffer(m["uvs"], np.float32).reshape(nv, 2)
                    if m["uvs"] is not None else None
                ),
                normals=(
                    np.frombuffer(m["normals"], np.float32).reshape(nv, 3)
                    if m["normals"] is not None else None
                ),
                indices=np.frombuffer(m["indices"] or b"", np.uint32),
                material_idx=m["material_idx"],
            )
        )
    return obj


def parse_obj_native(path: str):
    """Native OBJ parse → SourceObject (same semantics as assets/obj.py).
    Prefers the compiled extension module; falls back to ctypes."""
    from ..assets.obj import SourceMaterial, SourceMesh, SourceObject

    if load_ext() is not None:
        return _ext_parse_obj(path)
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


def _ext_parse_gltf(path: str):
    from ..assets.obj import SourceMaterial, SourceMesh, SourceObject

    mats, meshes = _ext.gltf_parse(path)
    obj = SourceObject()
    for m in mats:
        img = None
        if "texture_image" in m:
            w, h, rgba = m["texture_image"]
            img = np.frombuffer(rgba, np.uint8).reshape(h, w, 4).copy()
        obj.materials.append(
            SourceMaterial(
                color=tuple(m["color"]), texture_path=m["texture_path"],
                texture_image=img,
                roughness=m["roughness"], metalness=m["metalness"],
            )
        )
    for m in meshes:
        nv = m["num_vertices"]
        obj.meshes.append(
            SourceMesh(
                positions=np.frombuffer(m["positions"] or b"", np.float32).reshape(nv, 3),
                uvs=(
                    np.frombuffer(m["uvs"], np.float32).reshape(nv, 2)
                    if m["uvs"] is not None else None
                ),
                normals=(
                    np.frombuffer(m["normals"], np.float32).reshape(nv, 3)
                    if m["normals"] is not None else None
                ),
                indices=np.frombuffer(m["indices"] or b"", np.uint32),
                material_idx=m["material_idx"],
            )
        )
    return obj


def parse_gltf_native(path: str):
    """Native glTF/GLB parse → SourceObject, with transparent fallback.

    gltf.cpp mirrors assets/gltf.py's supported scope; on anything it
    gates (sparse accessors, Draco/meshopt, KTX2/basisu textures,
    non-PNG images) it reports an error and the pure-Python parser takes
    over — which either handles it (KTX2 textures) or raises the
    documented loud NotImplementedError. Missing files raise
    FileNotFoundError from either tier."""
    from ..assets.gltf import parse_gltf
    from ..assets.obj import SourceMaterial, SourceMesh, SourceObject

    if load_ext() is not None:
        try:
            return _ext_parse_gltf(path)
        except ValueError:
            return parse_gltf(path)  # scope gate → Python tier
    lib = load()
    if lib is None:
        return parse_gltf(path)
    h = lib.mrt_gltf_parse(path.encode())
    if not h:
        raise MemoryError("gltf_parse failed")
    try:
        err = lib.mrt_obj_error(h)
        if err:
            msg = err.decode()
            if msg.startswith("cannot open"):
                raise FileNotFoundError(msg)
            # Scope gate or malformed file: defer to the Python parser
            # (the semantic authority) for the real parse or the loud
            # exception.
            return parse_gltf(path)
        obj = SourceObject()
        for i in range(lib.mrt_obj_num_materials(h)):
            color = (ctypes.c_float * 4)()
            rough = ctypes.c_float()
            metal = ctypes.c_float()
            buf = ctypes.create_string_buffer(1024)
            lib.mrt_obj_material(h, i, color, ctypes.byref(rough),
                                 ctypes.byref(metal), buf, 1024)
            w = ctypes.c_int()
            hh = ctypes.c_int()
            img = None
            if lib.mrt_gltf_material_image_info(
                h, i, ctypes.byref(w), ctypes.byref(hh)
            ):
                img = np.zeros((hh.value, w.value, 4), np.uint8)
                lib.mrt_gltf_material_image(
                    h, i, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                )
            obj.materials.append(
                SourceMaterial(
                    color=tuple(color),
                    texture_path=buf.value.decode() or None,
                    texture_image=img,
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
                uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if uv is not None else None,
                nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if nrm is not None else None,
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
    if load_ext() is not None:
        w, h, rgba = _ext.png_decode(data)
        return np.frombuffer(rgba, np.uint8).reshape(h, w, 4).copy()
    lib = load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.mrt_png_size(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("not a PNG file")
    if (not 0 < w.value <= 1 << 20 or not 0 < h.value <= 1 << 20
            or w.value * h.value > 1 << 26):
        # Mirror of the C-side hostile-dimension bound: this np.zeros is
        # sized from the declared header before any data is validated.
        raise ValueError(
            f"PNG dimensions {w.value}x{h.value} exceed the "
            "hostile-input bound"
        )
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
    if load_ext() is not None:
        rgba = _ext.basislz_decode(sgd, level, width, height)
        return np.frombuffer(rgba, np.uint8).reshape(height, width, 4).copy()
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


def decode_astc_native(payload: bytes, width: int, height: int,
                       block_w: int = 4, block_h: int = 4,
                       srgb: bool = False) -> np.ndarray:
    """Decode an ASTC LDR payload → RGBA8 [H, W, 4] via the native
    decoder (astc.cpp — the C++ twin of assets/astc.py, differential-
    fuzzed against it). NotImplementedError for HDR/mixed-CEM blocks,
    ValueError for corrupt data."""
    if load_ext() is not None:
        rgba = _ext.astc_decode(payload, width, height, block_w, block_h,
                                int(srgb))
        return np.frombuffer(rgba, np.uint8).reshape(height, width, 4).copy()
    lib = load()
    assert lib is not None
    out = np.zeros((height, width, 4), np.uint8)
    rc = lib.mrt_astc_decode(
        payload, len(payload), width, height, block_w, block_h, int(srgb),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        err = lib.mrt_astc_error()
        msg = err.decode() if err else "ASTC decode failed"
        if "HDR" in msg or "mixed" in msg or "unimplemented" in msg:
            raise NotImplementedError(msg)
        raise ValueError(msg)
    return out
