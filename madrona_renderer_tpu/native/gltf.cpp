// Native glTF 2.0 / GLB parser (C ABI, same ObjFile handle as the OBJ
// parser, so the existing mrt_obj_* accessors read its output).
//
// TPU-framework counterpart of the reference engine importer's cgltf
// backend (reference src/mgr.cpp:294-303 — `AssetImporter` dispatches
// .gltf/.glb to cgltf inside madrona_importer). Scope matches the
// Python twin assets/gltf.py exactly: meshes (POSITION / NORMAL /
// TEXCOORD_0 / indices, TRIANGLES only), node-hierarchy transforms
// baked into vertices (double-precision, rounded once to f32 — the
// Python parser's numpy arithmetic order is mirrored term for term so
// outputs are bit-identical), pbrMetallicRoughness materials, PNG
// images (GLB bufferViews, data: URIs, or external files; decoded
// through importer.cpp's PNG decoder). Anything beyond that scope
// (sparse accessors, Draco/meshopt, KTX2/basisu textures, non-PNG
// images) sets the handle error and the Python tier takes over — it
// either parses (KTX2) or raises the documented loud gate.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

#include "common.h"

namespace {

// ------------------------------------------------------------- JSON ----

struct JValue {
    enum Kind { Null, Bool, Num, Str, Arr, Obj } kind = Null;
    bool b = false;
    double num = 0.0;
    std::string str;
    std::vector<JValue> arr;
    std::map<std::string, JValue> obj;

    bool has(const std::string &k) const {
        return kind == Obj && obj.count(k) > 0;
    }
    const JValue &operator[](const std::string &k) const {
        static const JValue none;
        auto it = obj.find(k);
        return it == obj.end() ? none : it->second;
    }
    const JValue &at(size_t i) const {
        static const JValue none;
        return (kind == Arr && i < arr.size()) ? arr[i] : none;
    }
    double get(const std::string &k, double dflt) const {
        const JValue &v = (*this)[k];
        return v.kind == Num ? v.num : dflt;
    }
};

struct JParser {
    const char *p, *end;
    std::string err;

    explicit JParser(const char *data, size_t len)
        : p(data), end(data + len) {}

    void ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r'))
            ++p;
    }
    bool fail(const char *m) {
        if (err.empty()) err = m;
        return false;
    }
    bool lit(const char *s) {
        size_t n = strlen(s);
        if ((size_t)(end - p) < n || strncmp(p, s, n) != 0)
            return fail("bad literal");
        p += n;
        return true;
    }
    bool parse_string(std::string &out) {
        if (p >= end || *p != '"') return fail("expected string");
        ++p;
        out.clear();
        while (p < end && *p != '"') {
            char c = *p++;
            if (c != '\\') {
                out.push_back(c);
                continue;
            }
            if (p >= end) return fail("bad escape");
            char e = *p++;
            switch (e) {
                case '"': out.push_back('"'); break;
                case '\\': out.push_back('\\'); break;
                case '/': out.push_back('/'); break;
                case 'b': out.push_back('\b'); break;
                case 'f': out.push_back('\f'); break;
                case 'n': out.push_back('\n'); break;
                case 'r': out.push_back('\r'); break;
                case 't': out.push_back('\t'); break;
                case 'u': {
                    if (end - p < 4) return fail("bad \\u");
                    unsigned cp = 0;
                    for (int i = 0; i < 4; ++i) {
                        char h = *p++;
                        cp <<= 4;
                        if (h >= '0' && h <= '9') cp |= h - '0';
                        else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
                        else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
                        else return fail("bad \\u digit");
                    }
                    // UTF-8 encode (surrogate pairs unsupported — asset
                    // names only; mirrors json.loads well enough for the
                    // glTF structural fields we read).
                    if (cp < 0x80) out.push_back((char)cp);
                    else if (cp < 0x800) {
                        out.push_back((char)(0xC0 | (cp >> 6)));
                        out.push_back((char)(0x80 | (cp & 0x3F)));
                    } else {
                        out.push_back((char)(0xE0 | (cp >> 12)));
                        out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
                        out.push_back((char)(0x80 | (cp & 0x3F)));
                    }
                    break;
                }
                default: return fail("bad escape char");
            }
        }
        if (p >= end) return fail("unterminated string");
        ++p;  // closing quote
        return true;
    }
    bool parse_value(JValue &v, int depth) {
        if (depth > 64) return fail("nesting too deep");
        ws();
        if (p >= end) return fail("truncated JSON");
        char c = *p;
        if (c == '{') {
            ++p;
            v.kind = JValue::Obj;
            ws();
            if (p < end && *p == '}') { ++p; return true; }
            while (true) {
                ws();
                std::string key;
                if (!parse_string(key)) return false;
                ws();
                if (p >= end || *p != ':') return fail("expected ':'");
                ++p;
                JValue child;
                if (!parse_value(child, depth + 1)) return false;
                v.obj.emplace(std::move(key), std::move(child));
                ws();
                if (p < end && *p == ',') { ++p; continue; }
                if (p < end && *p == '}') { ++p; return true; }
                return fail("expected ',' or '}'");
            }
        }
        if (c == '[') {
            ++p;
            v.kind = JValue::Arr;
            ws();
            if (p < end && *p == ']') { ++p; return true; }
            while (true) {
                JValue child;
                if (!parse_value(child, depth + 1)) return false;
                v.arr.push_back(std::move(child));
                ws();
                if (p < end && *p == ',') { ++p; continue; }
                if (p < end && *p == ']') { ++p; return true; }
                return fail("expected ',' or ']'");
            }
        }
        if (c == '"') {
            v.kind = JValue::Str;
            return parse_string(v.str);
        }
        if (c == 't') { v.kind = JValue::Bool; v.b = true; return lit("true"); }
        if (c == 'f') { v.kind = JValue::Bool; v.b = false; return lit("false"); }
        if (c == 'n') { v.kind = JValue::Null; return lit("null"); }
        // number
        char *numend = nullptr;
        v.kind = JValue::Num;
        v.num = strtod(p, &numend);
        if (numend == p || numend > end) return fail("bad number");
        p = numend;
        return true;
    }
};

// ---------------------------------------------------------- base64 ----

bool b64_decode(const std::string &in, std::vector<uint8_t> &out) {
    auto val = [](char c) -> int {
        if (c >= 'A' && c <= 'Z') return c - 'A';
        if (c >= 'a' && c <= 'z') return c - 'a' + 26;
        if (c >= '0' && c <= '9') return c - '0' + 52;
        if (c == '+') return 62;
        if (c == '/') return 63;
        return -1;
    };
    out.clear();
    int acc = 0, bits = 0;
    for (char c : in) {
        if (c == '=' || c == '\n' || c == '\r') continue;
        int v = val(c);
        if (v < 0) return false;
        acc = (acc << 6) | v;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            out.push_back((uint8_t)((acc >> bits) & 0xFF));
        }
    }
    return true;
}

// --------------------------------------------------------- buffers ----

struct Buffers {
    const JValue *gltf = nullptr;
    std::string base_dir;
    std::vector<uint8_t> glb_bin;
    std::map<int, std::vector<uint8_t>> cache;
    std::string err;

    const std::vector<uint8_t> *buffer(int i) {
        auto it = cache.find(i);
        if (it != cache.end()) return &it->second;
        const JValue &spec = (*gltf)["buffers"].at(i);
        std::vector<uint8_t> data;
        if (!spec.has("uri")) {
            data = glb_bin;
        } else {
            const std::string &uri = spec["uri"].str;
            if (uri.rfind("data:", 0) == 0) {
                size_t comma = uri.find(',');
                if (comma == std::string::npos ||
                    !b64_decode(uri.substr(comma + 1), data)) {
                    err = "bad data: URI";
                    return nullptr;
                }
            } else {
                FILE *f = fopen((base_dir + uri).c_str(), "rb");
                if (!f) {
                    err = "cannot open buffer file: " + uri;
                    return nullptr;
                }
                fseek(f, 0, SEEK_END);
                long n = ftell(f);
                fseek(f, 0, SEEK_SET);
                data.resize((size_t)n);
                if (n && fread(data.data(), 1, (size_t)n, f) != (size_t)n) {
                    fclose(f);
                    err = "short read: " + uri;
                    return nullptr;
                }
                fclose(f);
            }
        }
        return &(cache[i] = std::move(data));
    }

    bool view_bytes(int view_idx, std::vector<uint8_t> &out) {
        const JValue &view = (*gltf)["bufferViews"].at(view_idx);
        const std::vector<uint8_t> *buf = buffer((int)view.get("buffer", 0));
        if (!buf) return false;
        size_t off = (size_t)view.get("byteOffset", 0);
        size_t len = (size_t)view.get("byteLength", 0);
        if (off + len > buf->size()) {
            err = "bufferView out of range";
            return false;
        }
        out.assign(buf->begin() + off, buf->begin() + off + len);
        return true;
    }

    // Accessor → doubles [count * ncomp] (the Python parser goes through
    // float64 numpy before the single final f32 round).
    bool accessor(int idx, std::vector<double> &out, int &ncomp,
                  long &count) {
        const JValue &acc = (*gltf)["accessors"].at(idx);
        if (acc.has("sparse")) {
            err = "sparse accessor";
            return false;
        }
        int ctype = (int)acc.get("componentType", 0);
        const std::string &ty = acc["type"].str;
        ncomp = ty == "SCALAR" ? 1 : ty == "VEC2" ? 2 : ty == "VEC3" ? 3
                : ty == "VEC4" ? 4 : ty == "MAT4" ? 16 : 0;
        if (!ncomp) {
            err = "bad accessor type";
            return false;
        }
        count = (long)acc.get("count", 0);
        if (count < 0) {
            err = "negative accessor count";
            return false;
        }
        if (!acc.has("bufferView")) {
            // Zero-filled accessor: the only size bound is the declared
            // count itself; allocate inside the entry-point try/catch
            // (a hostile count surfaces as a clean error, not terminate).
            out.assign((size_t)count * ncomp, 0.0);
            return true;
        }
        const JValue &view = (*gltf)["bufferViews"].at(
            (int)acc.get("bufferView", 0));
        const std::vector<uint8_t> *buf = buffer((int)view.get("buffer", 0));
        if (!buf) return false;
        long v_off = (long)view.get("byteOffset", 0);
        long a_off = (long)acc.get("byteOffset", 0);
        long s_raw = (long)view.get("byteStride", 0);
        if (v_off < 0 || a_off < 0 || s_raw < 0) {
            // A negative offset cast to size_t wraps to a huge value and
            // can overflow the range check back into bounds → OOB read.
            err = "negative accessor offset";
            return false;
        }
        size_t base = (size_t)v_off + (size_t)a_off;
        int isz = (ctype == 5120 || ctype == 5121) ? 1
                  : (ctype == 5122 || ctype == 5123) ? 2 : 4;
        size_t stride = (size_t)s_raw;
        if (!stride) stride = (size_t)ncomp * isz;
        // Bounds BEFORE the allocation (overflow-safe: divide, don't
        // multiply) — a hostile count must not drive out.assign into
        // bad_alloc, and base+count*stride must not wrap past size_t.
        size_t elem = (size_t)ncomp * isz;
        if (count) {
            if (base > buf->size() || elem > buf->size() - base ||
                (size_t)(count - 1) > (buf->size() - base - elem) / stride) {
                err = "accessor out of range";
                return false;
            }
        }
        out.assign((size_t)count * ncomp, 0.0);
        const uint8_t *raw = buf->data();
        for (long k = 0; k < count; ++k) {
            const uint8_t *el = raw + base + (size_t)k * stride;
            for (int j = 0; j < ncomp; ++j) {
                const uint8_t *q = el + (size_t)j * isz;
                double v;
                switch (ctype) {
                    case 5120: v = (double)(int8_t)q[0]; break;
                    case 5121: v = (double)q[0]; break;
                    case 5122: {
                        int16_t x;
                        memcpy(&x, q, 2);
                        v = x;
                        break;
                    }
                    case 5123: {
                        uint16_t x;
                        memcpy(&x, q, 2);
                        v = x;
                        break;
                    }
                    case 5125: {
                        uint32_t x;
                        memcpy(&x, q, 4);
                        v = x;
                        break;
                    }
                    case 5126: {
                        float x;
                        memcpy(&x, q, 4);
                        v = x;
                        break;
                    }
                    default:
                        err = "bad componentType";
                        return false;
                }
                out[(size_t)k * ncomp + j] = v;
            }
        }
        if (acc["normalized"].kind == JValue::Bool && acc["normalized"].b) {
            // Mirror assets/gltf.py: rescale through FLOAT32 (numpy
            // .astype(np.float32) / scale), clamp signed to >= -1.
            double scale = ctype == 5120 ? 127.0 : ctype == 5121 ? 255.0
                           : ctype == 5122 ? 32767.0
                           : ctype == 5123 ? 65535.0 : 0.0;
            if (scale != 0.0) {
                bool is_signed = ctype == 5120 || ctype == 5122;
                for (double &v : out) {
                    float f = (float)((float)v / (float)scale);
                    v = is_signed && f < -1.0f ? -1.0 : (double)f;
                }
            }
        }
        return true;
    }
};

// ------------------------------------------------------- mat4 math ----

struct Mat4 {
    double m[4][4];  // row-major: m[row][col]
    static Mat4 identity() {
        Mat4 r{};
        for (int i = 0; i < 4; ++i) r.m[i][i] = 1.0;
        return r;
    }
    Mat4 operator*(const Mat4 &o) const {
        Mat4 r{};
        for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j) {
                double s = 0.0;
                for (int k = 0; k < 4; ++k) s += m[i][k] * o.m[k][j];
                r.m[i][j] = s;
            }
        return r;
    }
};

Mat4 node_matrix(const JValue &node) {
    if (node.has("matrix")) {
        // glTF stores column-major; the Python twin does
        // reshape(4,4).T → row-major M[r][c] = list[c*4 + r].
        Mat4 r{};
        const JValue &a = node["matrix"];
        for (int c = 0; c < 4; ++c)
            for (int rr = 0; rr < 4; ++rr)
                r.m[rr][c] = a.at((size_t)c * 4 + rr).num;
        return r;
    }
    Mat4 m = Mat4::identity();
    if (node.has("translation"))
        for (int i = 0; i < 3; ++i)
            m.m[i][3] = node["translation"].at(i).num;
    if (node.has("rotation")) {
        double x = node["rotation"].at(0).num;
        double y = node["rotation"].at(1).num;
        double z = node["rotation"].at(2).num;
        double w = node["rotation"].at(3).num;  // glTF stores xyzw
        double rot[3][3] = {
            {1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)},
            {2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)},
            {2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)},
        };
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j) m.m[i][j] = rot[i][j];
    }
    if (node.has("scale"))
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j)
                m.m[j][i] *= node["scale"].at(i).num;
    return m;
}

// 3x3 inverse via adjugate (double). np.linalg.inv differs by at most
// an ulp or two in double; after the single f32 round the normals agree
// to float precision (the cross-check test uses a 1e-6 tolerance).
bool inv3(const double a[3][3], double out[3][3]) {
    double det = a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1]) -
                 a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0]) +
                 a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]);
    if (det == 0.0) return false;
    double inv = 1.0 / det;
    out[0][0] = (a[1][1] * a[2][2] - a[1][2] * a[2][1]) * inv;
    out[0][1] = (a[0][2] * a[2][1] - a[0][1] * a[2][2]) * inv;
    out[0][2] = (a[0][1] * a[1][2] - a[0][2] * a[1][1]) * inv;
    out[1][0] = (a[1][2] * a[2][0] - a[1][0] * a[2][2]) * inv;
    out[1][1] = (a[0][0] * a[2][2] - a[0][2] * a[2][0]) * inv;
    out[1][2] = (a[0][2] * a[1][0] - a[0][0] * a[1][2]) * inv;
    out[2][0] = (a[1][0] * a[2][1] - a[1][1] * a[2][0]) * inv;
    out[2][1] = (a[0][1] * a[2][0] - a[0][0] * a[2][1]) * inv;
    out[2][2] = (a[0][0] * a[1][1] - a[0][1] * a[1][0]) * inv;
    return true;
}

// ----------------------------------------------------------- parse ----

std::string dir_of_path(const std::string &path) {
    size_t pos = path.find_last_of('/');
    return pos == std::string::npos ? std::string() : path.substr(0, pos + 1);
}

bool is_png(const uint8_t *d, size_t n) {
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A,
                                   '\n'};
    return n >= 8 && memcmp(d, sig, 8) == 0;
}

struct GltfParser {
    ObjFile *out;
    JValue gltf;
    Buffers bufs;
    std::string base_dir;

    bool fail(const std::string &m) {
        if (out->error.empty()) out->error = "gltf: " + m;
        return false;
    }

    bool load_image_rgba(int img_idx, Material &mat) {
        const JValue &img = gltf["images"].at(img_idx);
        std::vector<uint8_t> raw;
        if (img.has("bufferView")) {
            if (!bufs.view_bytes((int)img.get("bufferView", 0), raw))
                return fail(bufs.err);
        } else if (img.has("uri")) {
            const std::string &uri = img["uri"].str;
            if (uri.rfind("data:", 0) == 0) {
                size_t comma = uri.find(',');
                if (comma == std::string::npos ||
                    !b64_decode(uri.substr(comma + 1), raw))
                    return fail("bad image data: URI");
            } else {
                FILE *f = fopen((base_dir + uri).c_str(), "rb");
                if (!f) return fail("cannot open image: " + uri);
                fseek(f, 0, SEEK_END);
                long n = ftell(f);
                fseek(f, 0, SEEK_SET);
                raw.resize((size_t)n);
                if (n && fread(raw.data(), 1, (size_t)n, f) != (size_t)n) {
                    fclose(f);
                    return fail("short image read: " + uri);
                }
                fclose(f);
            }
        } else {
            return true;  // no payload — Python returns None too
        }
        if (!is_png(raw.data(), raw.size()))
            return fail("non-PNG embedded image (python tier handles KTX2)");
        int w = 0, h = 0;
        if (mrt_png_size(raw.data(), (long)raw.size(), &w, &h))
            return fail("bad PNG image");
        mat.tex_rgba.assign((size_t)w * h * 4, 0);
        if (mrt_png_decode(raw.data(), (long)raw.size(),
                           mat.tex_rgba.data(), w, h))
            return fail("PNG decode failed");
        mat.tex_w = w;
        mat.tex_h = h;
        return true;
    }

    bool parse(const std::string &path) {
        base_dir = dir_of_path(path);
        bufs.base_dir = base_dir;
        FILE *f = fopen(path.c_str(), "rb");
        if (!f) {
            out->error = "cannot open " + path;
            return false;
        }
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> data((size_t)n);
        if (n && fread(data.data(), 1, (size_t)n, f) != (size_t)n) {
            fclose(f);
            out->error = "short read: " + path;
            return false;
        }
        fclose(f);

        // JSON text is copied into a NUL-terminated string: strtod in
        // the parser must never scan past the chunk (a number at the
        // chunk boundary would otherwise read into the BIN chunk or
        // past the file buffer).
        std::string json_s;
        if (n >= 12 && memcmp(data.data(), "glTF", 4) == 0) {
            uint32_t version, total;
            memcpy(&version, data.data() + 4, 4);
            memcpy(&total, data.data() + 8, 4);
            if (version != 2) return fail("GLB version != 2");
            size_t pos = 12;
            while (pos + 8 <= data.size()) {
                uint32_t clen, ctype;
                memcpy(&clen, data.data() + pos, 4);
                memcpy(&ctype, data.data() + pos + 4, 4);
                size_t body = pos + 8;
                size_t avail = data.size() - body;
                size_t take = clen < avail ? clen : avail;
                if (ctype == 0x4E4F534A) {  // 'JSON'
                    json_s.assign((const char *)data.data() + body, take);
                } else if (ctype == 0x004E4942) {  // 'BIN\0'
                    bufs.glb_bin.assign(data.begin() + body,
                                        data.begin() + body + take);
                }
                pos = body + clen;
            }
            if (json_s.empty()) return fail("GLB missing JSON chunk");
        } else {
            json_s.assign((const char *)data.data(), data.size());
        }
        JParser jp(json_s.c_str(), json_s.size());
        if (!jp.parse_value(gltf, 0)) return fail("JSON: " + jp.err);
        bufs.gltf = &gltf;

        // Root-level required-extension gate (glTF §3.12): compression
        // extensions (meshopt/draco) rewrite bufferView payloads, so
        // accessors would decode garbage. Fail -> transparent Python
        // fallback, whose own gate raises the loud NotImplementedError.
        if (gltf.has("extensionsRequired"))
            for (const auto &e : gltf["extensionsRequired"].arr)
                if (e.str != "KHR_texture_basisu")
                    return fail("required extension " + e.str);

        // Materials.
        const JValue &mats = gltf["materials"];
        for (size_t mi = 0; mi < mats.arr.size(); ++mi) {
            const JValue &m = mats.at(mi);
            const JValue &pbr = m["pbrMetallicRoughness"];
            Material outm;
            outm.name = m.has("name") ? m["name"].str
                                      : "material_" + std::to_string(mi);
            if (pbr.has("baseColorFactor"))
                for (int i = 0; i < 4; ++i)
                    outm.color[i] = (float)pbr["baseColorFactor"].at(i).num;
            outm.roughness = (float)pbr.get("roughnessFactor", 0.8);
            outm.metalness = (float)pbr.get("metallicFactor", 0.2);
            if (pbr.has("baseColorTexture")) {
                const JValue &tex = gltf["textures"].at(
                    (size_t)pbr["baseColorTexture"].get("index", 0));
                if (tex["extensions"].has("KHR_texture_basisu"))
                    return fail("KHR_texture_basisu (python tier decodes "
                                "KTX2)");
                if (tex.has("source")) {
                    if (!load_image_rgba((int)tex.get("source", 0), outm))
                        return false;
                }
            }
            out->materials.push_back(std::move(outm));
        }

        // Node world transforms (default scene, or all root nodes).
        const JValue &nodes = gltf["nodes"];
        size_t scene_idx = (size_t)gltf.get("scene", 0);
        std::vector<std::pair<size_t, Mat4>> instances;
        std::vector<size_t> roots;
        const JValue &scenes = gltf["scenes"];
        const JValue &scene = scenes.at(scene_idx);
        if (scene.has("nodes")) {
            for (const JValue &v : scene["nodes"].arr)
                roots.push_back((size_t)v.num);
        } else {
            for (size_t i = 0; i < nodes.arr.size(); ++i) roots.push_back(i);
        }
        // Iterative DFS mirroring the recursive walk's visit order.
        struct Item {
            size_t node;
            Mat4 parent;
        };
        std::vector<Item> stack;
        for (size_t ri = roots.size(); ri-- > 0;)
            stack.push_back({roots[ri], Mat4::identity()});
        size_t guard = 0;
        while (!stack.empty()) {
            if (++guard > 1000000) return fail("node cycle");
            Item it = stack.back();
            stack.pop_back();
            const JValue &node = nodes.at(it.node);
            Mat4 world = it.parent * node_matrix(node);
            if (node.has("mesh"))
                instances.push_back({(size_t)node.get("mesh", 0), world});
            const JValue &children = node["children"];
            for (size_t ci = children.arr.size(); ci-- > 0;)
                stack.push_back({(size_t)children.at(ci).num, world});
        }
        if (instances.empty())
            for (size_t i = 0; i < gltf["meshes"].arr.size(); ++i)
                instances.push_back({i, Mat4::identity()});

        // Primitives → meshes.
        for (auto &inst : instances) {
            const JValue &mesh = gltf["meshes"].at(inst.first);
            const Mat4 &W = inst.second;
            for (const JValue &prim : mesh["primitives"].arr) {
                if ((int)prim.get("mode", 4) != 4)
                    return fail("non-TRIANGLES primitive");
                if (prim.has("extensions"))
                    for (auto &kv : prim["extensions"].obj) {
                        std::string lower = kv.first;
                        for (char &c : lower) c = (char)tolower(c);
                        if (lower.find("draco") != std::string::npos ||
                            lower.find("meshopt") != std::string::npos)
                            return fail(kv.first + " compression");
                    }
                const JValue &attrs = prim["attributes"];
                if (!attrs.has("POSITION")) return fail("no POSITION");
                std::vector<double> pos;
                int nc;
                long cnt;
                if (!bufs.accessor((int)attrs.get("POSITION", 0), pos, nc,
                                   cnt))
                    return fail(bufs.err);
                Mesh outmesh;
                outmesh.positions.resize((size_t)cnt * 3);
                for (long k = 0; k < cnt; ++k) {
                    const double *pv = &pos[(size_t)k * nc];
                    // The Python twin casts the accessor to f32 BEFORE
                    // the float64 matmul (.astype(np.float32)); mirror
                    // the rounding points exactly.
                    double p0 = (float)pv[0], p1 = (float)pv[1],
                           p2 = (float)pv[2];
                    for (int j = 0; j < 3; ++j) {
                        // numpy: pos @ W3.T + t, summed i = 0,1,2.
                        double s = p0 * W.m[j][0] + p1 * W.m[j][1] +
                                   p2 * W.m[j][2] + W.m[j][3];
                        outmesh.positions[(size_t)k * 3 + j] = (float)s;
                    }
                }
                if (attrs.has("NORMAL")) {
                    std::vector<double> nrm;
                    if (!bufs.accessor((int)attrs.get("NORMAL", 0), nrm, nc,
                                       cnt))
                        return fail(bufs.err);
                    double w3[3][3];
                    for (int i = 0; i < 3; ++i)
                        for (int j = 0; j < 3; ++j) w3[i][j] = W.m[i][j];
                    double iv[3][3];
                    if (!inv3(w3, iv)) return fail("singular node matrix");
                    outmesh.has_normal = true;
                    outmesh.normals.resize((size_t)cnt * 3);
                    for (long k = 0; k < cnt; ++k) {
                        const double *nv = &nrm[(size_t)k * nc];
                        double n0 = (float)nv[0], n1 = (float)nv[1],
                               n2 = (float)nv[2];
                        for (int j = 0; j < 3; ++j) {
                            // numpy: nrm @ inv(W3) (n^T W^-1).
                            double s = n0 * iv[0][j] + n1 * iv[1][j] +
                                       n2 * iv[2][j];
                            outmesh.normals[(size_t)k * 3 + j] = (float)s;
                        }
                    }
                }
                if (attrs.has("TEXCOORD_0")) {
                    std::vector<double> uv;
                    if (!bufs.accessor((int)attrs.get("TEXCOORD_0", 0), uv,
                                       nc, cnt))
                        return fail(bufs.err);
                    outmesh.has_uv = true;
                    outmesh.uvs.resize((size_t)cnt * 2);
                    for (long k = 0; k < cnt; ++k) {
                        outmesh.uvs[(size_t)k * 2] =
                            (float)(float)uv[(size_t)k * nc];
                        outmesh.uvs[(size_t)k * 2 + 1] =
                            (float)(1.0f - (float)uv[(size_t)k * nc + 1]);
                    }
                }
                if (prim.has("indices")) {
                    std::vector<double> idx;
                    if (!bufs.accessor((int)prim.get("indices", 0), idx, nc,
                                       cnt))
                        return fail(bufs.err);
                    outmesh.indices.resize((size_t)cnt);
                    for (long k = 0; k < cnt; ++k)
                        outmesh.indices[(size_t)k] = (uint32_t)idx[(size_t)k];
                } else {
                    outmesh.indices.resize(outmesh.positions.size() / 3);
                    for (size_t k = 0; k < outmesh.indices.size(); ++k)
                        outmesh.indices[k] = (uint32_t)k;
                }
                outmesh.material_idx =
                    prim.has("material") ? (int32_t)prim.get("material", 0)
                                         : -1;
                out->meshes.push_back(std::move(outmesh));
            }
        }
        if (out->meshes.empty()) {
            Mesh empty;
            out->meshes.push_back(std::move(empty));
        }
        return true;
    }
};

}  // namespace

extern "C" {

void *mrt_gltf_parse(const char *path) {
    auto *h = new (std::nothrow) ObjFile();
    if (!h) return nullptr;
    // No C++ exception may cross the C boundary: a hostile file whose
    // declared sizes drive a failed allocation must surface as an error
    // string (→ Python exception), never std::terminate.
    try {
        GltfParser gp;
        gp.out = h;
        if (!gp.parse(path) && h->error.empty())
            h->error = "gltf: parse failed";
    } catch (const std::bad_alloc &) {
        h->error = "gltf: allocation failed (corrupt or hostile sizes)";
    } catch (const std::exception &e) {
        h->error = std::string("gltf: ") + e.what();
    }
    return h;  // read error via mrt_obj_error, free via mrt_obj_free
}

int mrt_gltf_material_image_info(void *h, int i, int *w, int *hh) {
    const Material &m = ((ObjFile *)h)->materials[(size_t)i];
    *w = m.tex_w;
    *hh = m.tex_h;
    return m.tex_w > 0 && m.tex_h > 0 ? 1 : 0;
}

void mrt_gltf_material_image(void *h, int i, uint8_t *rgba) {
    const Material &m = ((ObjFile *)h)->materials[(size_t)i];
    memcpy(rgba, m.tex_rgba.data(), m.tex_rgba.size());
}

}  // extern "C"
