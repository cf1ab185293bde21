// CPython extension module variant of the native bindings.
//
// The reference ships its Python surface as a compiled extension module
// (nanobind, reference src/bindings.cpp:18-234). This is the analogous
// compiled-module path for our native importer library: the same C++
// implementation (importer.cpp / etc1s.cpp) exposed through the CPython
// C API instead of ctypes. native/__init__.py prefers this module when
// it builds, and falls back to the ctypes bindings (and those fall back
// to pure Python) — three tiers, identical semantics.
//
// API design: functions return plain Python objects (bytes, tuples,
// dicts); numpy wrapping happens on the Python side via np.frombuffer —
// no numpy C API dependency, so the module builds against any CPython.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

// C ABI from importer.cpp / etc1s.cpp (compiled into this module).
extern "C" {
void *mrt_obj_parse(const char *path);
const char *mrt_obj_error(void *h);
void mrt_obj_free(void *h);
int mrt_obj_num_meshes(void *h);
void mrt_obj_mesh_info(void *h, int i, int *num_vertices, int *num_indices,
                       int *material_idx, int *has_uv, int *has_normal);
void mrt_obj_mesh_data(void *h, int i, float *positions, float *uvs,
                       float *normals, uint32_t *indices);
int mrt_obj_num_materials(void *h);
void mrt_obj_material(void *h, int i, float *color4, float *roughness,
                      float *metalness, char *tex_path, int tex_path_cap);
int mrt_png_size(const uint8_t *data, long n, int *w, int *hgt);
int mrt_png_decode(const uint8_t *data, long n, uint8_t *out_rgba,
                   int expected_w, int expected_h);
int mrt_basislz_decode(const uint8_t *sgd, long sgd_len, const uint8_t *level,
                       long level_len, int width, int height,
                       uint8_t *out_rgba);
const char *mrt_basislz_error();
int mrt_astc_decode(const uint8_t *payload, size_t payload_len, int width,
                    int height, int block_w, int block_h, int srgb,
                    uint8_t *out);
const char *mrt_astc_error();
void *mrt_gltf_parse(const char *path);
int mrt_gltf_material_image_info(void *h, int i, int *w, int *hh);
void mrt_gltf_material_image(void *h, int i, uint8_t *rgba);
}

namespace {

PyObject *build_parse_result(void *h, bool with_images);

PyObject *py_obj_parse(PyObject *, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    void *h = mrt_obj_parse(path);
    if (!h) return PyErr_NoMemory();
    const char *err = mrt_obj_error(h);
    if (err) {
        bool missing = strncmp(err, "cannot open", 11) == 0;
        PyErr_SetString(
            missing ? PyExc_FileNotFoundError : PyExc_ValueError, err);
        mrt_obj_free(h);
        return nullptr;
    }
    return build_parse_result(h, false);
}

// GLB/glTF through the same handle layout; scope gates surface as
// ValueError so the Python wrapper can fall back to the pure parser.
PyObject *py_gltf_parse(PyObject *, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    void *h = mrt_gltf_parse(path);
    if (!h) return PyErr_NoMemory();
    const char *err = mrt_obj_error(h);
    if (err) {
        bool missing = strncmp(err, "cannot open", 11) == 0;
        PyErr_SetString(
            missing ? PyExc_FileNotFoundError : PyExc_ValueError, err);
        mrt_obj_free(h);
        return nullptr;
    }
    return build_parse_result(h, true);
}

// Marshal the parsed handle to (materials, meshes) plain dicts and free
// it. with_images adds decoded embedded textures (GLB path).
PyObject *build_parse_result(void *h, bool with_images) {
    PyObject *mats = PyList_New(0);
    PyObject *meshes = PyList_New(0);
    // Every allocation / append below is checked: on failure fall through
    // to `fail` (Py_XDECREF tolerates the NULLs) — Py_DECREF(NULL) would
    // crash the interpreter on allocation failure.
    if (!mats || !meshes) goto fail;
    {
        char tex[1024];
        for (int i = 0; i < mrt_obj_num_materials(h); ++i) {
            float color[4], rough, metal;
            mrt_obj_material(h, i, color, &rough, &metal, tex, sizeof tex);
            PyObject *m = Py_BuildValue(
                "{s:(ffff),s:f,s:f,s:s}", "color", color[0], color[1],
                color[2], color[3], "roughness", rough, "metalness", metal,
                "texture_path", tex[0] ? tex : nullptr);
            if (!m) goto fail;
            if (with_images) {
                int iw = 0, ih = 0;
                if (mrt_gltf_material_image_info(h, i, &iw, &ih)) {
                    PyObject *b = PyBytes_FromStringAndSize(
                        nullptr, (Py_ssize_t)iw * ih * 4);
                    if (!b) { Py_DECREF(m); goto fail; }
                    mrt_gltf_material_image(
                        h, i, (uint8_t *)PyBytes_AS_STRING(b));
                    PyObject *info = Py_BuildValue("(iiO)", iw, ih, b);
                    Py_DECREF(b);
                    int rc2 = info ? PyDict_SetItemString(
                                         m, "texture_image", info)
                                   : -1;
                    Py_XDECREF(info);
                    if (rc2 != 0) { Py_DECREF(m); goto fail; }
                }
            }
            int rc = PyList_Append(mats, m);
            Py_DECREF(m);
            if (rc != 0) goto fail;
        }
        for (int i = 0; i < mrt_obj_num_meshes(h); ++i) {
            int nv, ni, mi, huv, hn;
            mrt_obj_mesh_info(h, i, &nv, &ni, &mi, &huv, &hn);
            std::vector<float> pos((size_t)nv * 3), uv((size_t)nv * 2),
                nrm((size_t)nv * 3);
            std::vector<uint32_t> idx((size_t)ni);
            mrt_obj_mesh_data(h, i, pos.data(), huv ? uv.data() : nullptr,
                              hn ? nrm.data() : nullptr, idx.data());
            // Empty meshes (a face-less OBJ): vector::data() may be NULL,
            // and Py_BuildValue "y#" with NULL yields None instead of
            // b"" — pass a real pointer so 0-vertex meshes marshal as
            // empty bytes.
            static const char kEmpty[1] = {0};
            const char *pos_p = pos.empty() ? kEmpty : (const char *)pos.data();
            const char *idx_p = idx.empty() ? kEmpty : (const char *)idx.data();
            PyObject *m = Py_BuildValue(
                "{s:i,s:i,s:i,s:y#,s:O,s:O,s:y#}", "num_vertices", nv,
                "num_indices", ni, "material_idx", mi, "positions",
                pos_p, (Py_ssize_t)(pos.size() * 4), "uvs",
                Py_None, "normals", Py_None, "indices",
                idx_p, (Py_ssize_t)(idx.size() * 4));
            if (!m) goto fail;
            if (huv) {
                PyObject *b = PyBytes_FromStringAndSize(
                    (const char *)uv.data(), (Py_ssize_t)(uv.size() * 4));
                int rc = b ? PyDict_SetItemString(m, "uvs", b) : -1;
                Py_XDECREF(b);
                if (rc != 0) { Py_DECREF(m); goto fail; }
            }
            if (hn) {
                PyObject *b = PyBytes_FromStringAndSize(
                    (const char *)nrm.data(), (Py_ssize_t)(nrm.size() * 4));
                int rc = b ? PyDict_SetItemString(m, "normals", b) : -1;
                Py_XDECREF(b);
                if (rc != 0) { Py_DECREF(m); goto fail; }
            }
            int rc = PyList_Append(meshes, m);
            Py_DECREF(m);
            if (rc != 0) goto fail;
        }
    }
    {
        mrt_obj_free(h);
        PyObject *out = Py_BuildValue("(OO)", mats, meshes);
        Py_DECREF(mats);
        Py_DECREF(meshes);
        return out;
    }
fail:
    mrt_obj_free(h);
    Py_XDECREF(mats);
    Py_XDECREF(meshes);
    return nullptr;
}

PyObject *py_png_decode(PyObject *, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    int w, h;
    if (mrt_png_size((const uint8_t *)buf.buf, (long)buf.len, &w, &h) != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "not a PNG file");
        return nullptr;
    }
    PyObject *bytes = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)w * h * 4);
    if (!bytes) {
        PyBuffer_Release(&buf);
        return nullptr;
    }
    int rc = mrt_png_decode((const uint8_t *)buf.buf, (long)buf.len,
                            (uint8_t *)PyBytes_AS_STRING(bytes), w, h);
    PyBuffer_Release(&buf);
    if (rc != 0) {
        Py_DECREF(bytes);
        PyErr_SetString(PyExc_ValueError,
                        rc == -2 ? "PNG decode failed: dimensions differ "
                                   "from header probe"
                                 : "PNG decode failed (unsupported variant?)");
        return nullptr;
    }
    PyObject *out = Py_BuildValue("(iiO)", w, h, bytes);
    Py_DECREF(bytes);
    return out;
}

PyObject *py_basislz_decode(PyObject *, PyObject *args) {
    Py_buffer sgd, level;
    int w, h;
    if (!PyArg_ParseTuple(args, "y*y*ii", &sgd, &level, &w, &h))
        return nullptr;
    PyObject *bytes = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)w * h * 4);
    if (!bytes) {
        PyBuffer_Release(&sgd);
        PyBuffer_Release(&level);
        return nullptr;
    }
    int rc = mrt_basislz_decode((const uint8_t *)sgd.buf, (long)sgd.len,
                                (const uint8_t *)level.buf, (long)level.len,
                                w, h, (uint8_t *)PyBytes_AS_STRING(bytes));
    PyBuffer_Release(&sgd);
    PyBuffer_Release(&level);
    if (rc != 0) {
        Py_DECREF(bytes);
        const char *err = mrt_basislz_error();
        std::string msg = err ? err : "BasisLZ decode failed";
        PyErr_SetString(msg.find("not supported") != std::string::npos
                            ? PyExc_NotImplementedError
                            : PyExc_ValueError,
                        ("KTX2 BasisLZ: " + msg).c_str());
        return nullptr;
    }
    return bytes;
}

PyObject *py_astc_decode(PyObject *, PyObject *args) {
    Py_buffer payload;
    int w, h, bw, bh, srgb;
    if (!PyArg_ParseTuple(args, "y*iiiii", &payload, &w, &h, &bw, &bh,
                          &srgb))
        return nullptr;
    if (w <= 0 || h <= 0) {
        PyBuffer_Release(&payload);
        PyErr_SetString(PyExc_ValueError, "ASTC: bad dimensions");
        return nullptr;
    }
    PyObject *bytes = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)w * h * 4);
    if (!bytes) {
        PyBuffer_Release(&payload);
        return nullptr;
    }
    int rc = mrt_astc_decode((const uint8_t *)payload.buf,
                             (size_t)payload.len, w, h, bw, bh, srgb,
                             (uint8_t *)PyBytes_AS_STRING(bytes));
    PyBuffer_Release(&payload);
    if (rc != 0) {
        Py_DECREF(bytes);
        const char *err = mrt_astc_error();
        std::string msg = err ? err : "ASTC decode failed";
        bool ni = msg.find("HDR") != std::string::npos ||
                  msg.find("mixed") != std::string::npos ||
                  msg.find("unimplemented") != std::string::npos;
        PyErr_SetString(ni ? PyExc_NotImplementedError : PyExc_ValueError,
                        msg.c_str());
        return nullptr;
    }
    return bytes;
}

PyMethodDef kMethods[] = {
    {"obj_parse", py_obj_parse, METH_VARARGS,
     "Parse an OBJ(+MTL) file -> (materials, meshes) of plain dicts; "
     "vertex data as float32/uint32 bytes."},
    {"gltf_parse", py_gltf_parse, METH_VARARGS,
     "Parse a GLB/glTF file -> (materials, meshes); embedded textures as "
     "(w, h, rgba8 bytes) under 'texture_image'. Raises ValueError on "
     "scope gates (caller falls back to the Python parser)."},
    {"png_decode", py_png_decode, METH_VARARGS,
     "Decode PNG bytes -> (width, height, rgba8 bytes)."},
    {"basislz_decode", py_basislz_decode, METH_VARARGS,
     "Decode KTX2 BasisLZ (sgd, level, w, h) -> rgba8 bytes."},
    {"astc_decode", py_astc_decode, METH_VARARGS,
     "Decode an ASTC LDR payload (payload, w, h, bw, bh, srgb) -> "
     "rgba8 bytes."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_mrt_ext",
    "Compiled-extension variant of the madrona_renderer_tpu native "
    "importer (same C++ core as the ctypes path).",
    -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__mrt_ext(void) { return PyModule_Create(&kModule); }
