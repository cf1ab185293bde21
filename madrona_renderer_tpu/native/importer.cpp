// Native asset importer: OBJ/MTL parser + PNG decoder (C ABI, ctypes-bound).
//
// This is the TPU framework's counterpart of the reference's native import
// stack (madrona_importer + stb/libktx image decode — usage at reference
// src/mgr.cpp:294-323). The compute path is JAX/XLA; import is host I/O and
// belongs in native code: the C++ PNG unfilter + OBJ tokenizer are 50-100x
// the pure-Python fallbacks on large assets. Semantics are kept identical
// to the Python implementations in assets/obj.py and assets/png.py (the
// test suite cross-checks both paths on the same files).
//
// Build: see native/build.py (g++ -O2 -shared -fPIC importer.cpp -lz).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

#include "common.h"

namespace {

// ---------------------------------------------------------------- OBJ ----

struct Corner {
    int32_t v, vt, vn;
    bool operator==(const Corner &o) const {
        return v == o.v && vt == o.vt && vn == o.vn;
    }
};

struct CornerHash {
    size_t operator()(const Corner &c) const {
        size_t h = (size_t)(uint32_t)c.v;
        h = h * 1000003u ^ (size_t)(uint32_t)c.vt;
        h = h * 1000003u ^ (size_t)(uint32_t)c.vn;
        return h;
    }
};

// Material/Mesh/ObjFile live in common.h (shared with gltf.cpp).

std::string dir_of(const std::string &path) {
    size_t pos = path.find_last_of('/');
    return pos == std::string::npos ? std::string() : path.substr(0, pos + 1);
}

// Build one mesh per material group, re-indexing (v, vt, vn) triples —
// mirrors assets/obj.py parse_obj exactly.
struct Group {
    std::vector<Corner> corners;  // 3 per triangle
    int32_t material_idx;
};

const char *skip_ws(const char *p, const char *end) {
    // Must skip exactly the characters isspace() treats as space (minus
    // '\n', the line terminator): the face-corner loop tokenizes with
    // isspace(), and any space-class character this function does NOT
    // skip (historically '\f'/'\v') makes that loop spin forever on a
    // zero-length token, growing the corner vector until bad_alloc.
    // Python parity too: str.split() splits on all of " \t\r\f\v".
    while (p < end &&
           (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\f' || *p == '\v'))
        ++p;
    return p;
}

bool parse_mtl_file(const std::string &path, std::vector<Material> &out,
                    std::unordered_map<std::string, int32_t> &by_name) {
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) return false;
    std::string base = dir_of(path);
    char line[1024];
    Material *cur = nullptr;
    while (fgets(line, sizeof(line), f)) {
        char *p = line;
        while (*p == ' ' || *p == '\t') ++p;
        if (strncmp(p, "newmtl", 6) == 0 && isspace((unsigned char)p[6])) {
            char name[512] = {0};
            sscanf(p + 6, " %511[^\r\n]", name);
            if (by_name.count(name)) {
                cur = &out[by_name[name]];
            } else {
                by_name[name] = (int32_t)out.size();
                out.push_back(Material{});
                cur = &out.back();
                cur->name = name;
            }
        } else if (!cur) {
            continue;
        } else if (strncmp(p, "Kd", 2) == 0 && isspace((unsigned char)p[2])) {
            sscanf(p + 2, " %f %f %f", &cur->color[0], &cur->color[1], &cur->color[2]);
        } else if (p[0] == 'd' && isspace((unsigned char)p[1])) {
            sscanf(p + 1, " %f", &cur->color[3]);
        } else if (strncmp(p, "Ns", 2) == 0 && isspace((unsigned char)p[2])) {
            float ns = 0.f;
            sscanf(p + 2, " %f", &ns);
            float r = 1.0f - ns / 1000.0f;
            cur->roughness = r < 0.f ? 0.f : (r > 1.f ? 1.f : r);
        } else if (strncmp(p, "map_Kd", 6) == 0 && isspace((unsigned char)p[6])) {
            char tex[768] = {0};
            sscanf(p + 6, " %767[^\r\n]", tex);
            // last token (matches python: parts[-1])
            std::string t(tex);
            size_t sp = t.find_last_of(" \t");
            if (sp != std::string::npos) t = t.substr(sp + 1);
            cur->tex_path = t.size() && t[0] == '/' ? t : base + t;
        }
    }
    fclose(f);
    return true;
}

// Returns false on a malformed token (non-numeric character where an index
// is expected) — Python-parity: assets/obj.py raises ValueError via int().
bool parse_face_corner(const char *tok, int nv, int nvt, int nvn, Corner &c) {
    c.v = c.vt = c.vn = -1;
    int field = 0;
    const char *p = tok;
    while (*p && !isspace((unsigned char)*p)) {
        if (*p == '/') {
            ++field;
            ++p;
            continue;
        }
        char *endp = nullptr;
        long idx = strtol(p, &endp, 10);
        if (endp == p) return false;  // strtol made no progress: bad char
        p = endp;
        int n = field == 0 ? nv : (field == 1 ? nvt : nvn);
        int32_t val = idx > 0 ? (int32_t)(idx - 1) : (int32_t)(n + idx);
        if (field == 0) c.v = val;
        else if (field == 1) c.vt = val;
        else c.vn = val;
    }
    return true;
}

ObjFile *obj_parse_impl(const char *path) {
    auto *out = new ObjFile();
    FILE *f = fopen(path, "rb");
    if (!f) {
        out->error = std::string("cannot open ") + path;
        return out;
    }
    std::string base = dir_of(path);
    std::vector<float> vs, vts, vns;
    std::unordered_map<std::string, int32_t> mat_by_name;
    std::vector<Group> groups;
    std::unordered_map<int32_t, size_t> group_by_mat;
    int32_t cur_mat = -1;

    char line[4096];
    while (fgets(line, sizeof(line), f)) {
        const char *p = line;
        while (*p == ' ' || *p == '\t') ++p;
        if (p[0] == 'v' && p[1] == ' ') {
            float x, y, z;
            if (sscanf(p + 2, "%f %f %f", &x, &y, &z) == 3) {
                vs.push_back(x); vs.push_back(y); vs.push_back(z);
            }
        } else if (p[0] == 'v' && p[1] == 't' && isspace((unsigned char)p[2])) {
            float u = 0, v = 0;
            sscanf(p + 3, "%f %f", &u, &v);
            vts.push_back(u); vts.push_back(v);
        } else if (p[0] == 'v' && p[1] == 'n' && isspace((unsigned char)p[2])) {
            float x, y, z;
            if (sscanf(p + 3, "%f %f %f", &x, &y, &z) == 3) {
                vns.push_back(x); vns.push_back(y); vns.push_back(z);
            }
        } else if (strncmp(p, "mtllib", 6) == 0 && isspace((unsigned char)p[6])) {
            char name[768] = {0};
            sscanf(p + 6, " %767[^\r\n]", name);
            std::string mp = name[0] == '/' ? std::string(name) : base + name;
            parse_mtl_file(mp, out->materials, mat_by_name);
        } else if (strncmp(p, "usemtl", 6) == 0 && isspace((unsigned char)p[6])) {
            char name[512] = {0};
            sscanf(p + 6, " %511[^\r\n]", name);
            auto it = mat_by_name.find(name);
            if (it == mat_by_name.end()) {
                mat_by_name[name] = (int32_t)out->materials.size();
                Material m;
                m.name = name;
                out->materials.push_back(m);
                cur_mat = (int32_t)out->materials.size() - 1;
            } else {
                cur_mat = it->second;
            }
        } else if (p[0] == 'f' && isspace((unsigned char)p[1])) {
            int nv = (int)vs.size() / 3, nvt = (int)vts.size() / 2,
                nvn = (int)vns.size() / 3;
            std::vector<Corner> corners;
            const char *q = p + 1;
            const char *end = p + strlen(p);
            while (true) {
                q = skip_ws(q, end);
                if (q >= end || *q == '\n' || *q == '\0' || *q == '#') break;
                Corner c;
                if (!parse_face_corner(q, nv, nvt, nvn, c)) {
                    fclose(f);
                    out->error = std::string("malformed face token in ") + path;
                    return out;
                }
                corners.push_back(c);
                while (q < end && !isspace((unsigned char)*q)) ++q;
            }
            if (corners.size() < 3) continue;
            size_t gi;
            auto git = group_by_mat.find(cur_mat);
            if (git == group_by_mat.end()) {
                gi = groups.size();
                group_by_mat[cur_mat] = gi;
                groups.push_back(Group{{}, cur_mat});
            } else {
                gi = git->second;
            }
            auto &g = groups[gi].corners;
            for (size_t i = 1; i + 1 < corners.size(); ++i) {
                g.push_back(corners[0]);
                g.push_back(corners[i]);
                g.push_back(corners[i + 1]);
            }
        }
    }
    fclose(f);

    // Re-index each group into a unified vertex buffer (python parity).
    for (auto &grp : groups) {
        Mesh mesh;
        mesh.material_idx = grp.material_idx;
        std::unordered_map<Corner, uint32_t, CornerHash> remap;
        std::vector<Corner> uniq;
        mesh.indices.reserve(grp.corners.size());
        for (const auto &c : grp.corners) {
            auto it = remap.find(c);
            uint32_t j;
            if (it == remap.end()) {
                j = (uint32_t)uniq.size();
                remap.emplace(c, j);
                uniq.push_back(c);
                if (c.vt >= 0) mesh.has_uv = true;
                if (c.vn >= 0) mesh.has_normal = true;
            } else {
                j = it->second;
            }
            mesh.indices.push_back(j);
        }
        // Python parity (assets/obj.py): uv/normal output only when the
        // file declared any vt/vn data (face refs without data -> None).
        mesh.has_uv = mesh.has_uv && !vts.empty();
        mesh.has_normal = mesh.has_normal && !vns.empty();
        mesh.positions.resize(uniq.size() * 3);
        if (mesh.has_uv) mesh.uvs.resize(uniq.size() * 2);
        if (mesh.has_normal) mesh.normals.resize(uniq.size() * 3);
        for (size_t i = 0; i < uniq.size(); ++i) {
            const Corner &c = uniq[i];
            // Python-parser parity (assets/obj.py): out-of-range face
            // indices (vertex, texcoord, normal alike) are a loud
            // content error, never a silent zero-fill.
            if (c.v < 0 || (size_t)c.v * 3 + 2 >= vs.size()) {
                out->error = std::string("face vertex index out of range in ") + path;
                return out;
            }
            memcpy(&mesh.positions[i * 3], &vs[c.v * 3], 3 * sizeof(float));
            if (mesh.has_uv) {
                int vt = c.vt >= 0 ? c.vt : 0;
                if ((size_t)vt * 2 + 1 >= vts.size()) {
                    out->error = std::string("face texcoord index out of range in ") + path;
                    return out;
                }
                memcpy(&mesh.uvs[i * 2], &vts[vt * 2], 2 * sizeof(float));
            }
            if (mesh.has_normal) {
                int vn = c.vn >= 0 ? c.vn : 0;
                if ((size_t)vn * 3 + 2 >= vns.size()) {
                    out->error = std::string("face normal index out of range in ") + path;
                    return out;
                }
                memcpy(&mesh.normals[i * 3], &vns[vn * 3], 3 * sizeof(float));
            }
        }
        out->meshes.push_back(std::move(mesh));
    }
    if (out->meshes.empty()) out->meshes.push_back(Mesh{});
    return out;
}

// ---------------------------------------------------------------- PNG ----

struct PngImage {
    int width = 0, height = 0;
    std::vector<uint8_t> rgba;
    std::string error;
};

uint32_t be32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | p[3];
}

int channels_for(int color_type) {
    switch (color_type) {
        case 0: return 1;
        case 2: return 3;
        case 3: return 1;
        case 4: return 2;
        case 6: return 4;
    }
    return 0;
}

bool png_decode_impl(const uint8_t *data, size_t n, PngImage &img) {
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
    if (n < 8 || memcmp(data, sig, 8) != 0) {
        img.error = "not a PNG file";
        return false;
    }
    size_t pos = 8;
    int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
    std::vector<uint8_t> idat, palette, trns;
    while (pos + 8 <= n) {
        uint32_t len = be32(data + pos);
        const uint8_t *type = data + pos + 4;
        const uint8_t *body = data + pos + 8;
        if (pos + 12 + len > n) break;
        // Only the first IHDR counts: a later duplicate IHDR must not be
        // able to enlarge the image after the caller sized its buffer from
        // the probe (heap-overflow guard; mrt_png_size reads the first).
        if (memcmp(type, "IHDR", 4) == 0 && len >= 13 && width == 0) {
            width = (int)be32(body);
            height = (int)be32(body + 4);
            bit_depth = body[8];
            color_type = body[9];
            interlace = body[12];
        } else if (memcmp(type, "PLTE", 4) == 0) {
            palette.assign(body, body + len);
        } else if (memcmp(type, "tRNS", 4) == 0) {
            trns.assign(body, body + len);
        } else if (memcmp(type, "IDAT", 4) == 0) {
            idat.insert(idat.end(), body, body + len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + len;
    }
    if (bit_depth != 8 && bit_depth != 16) {
        img.error = "unsupported bit depth";
        return false;
    }
    int ch = channels_for(color_type);
    if (!ch || width <= 0 || height <= 0) { img.error = "bad header"; return false; }
    // Hostile-dimension bound (same rationale as the KTX2 guard): the
    // decode buffers are sized from the DECLARED header dims before any
    // data is validated, so a byte-flipped IHDR could demand a
    // many-gigabyte zero-filled allocation — an OOM/thrash DoS, not a
    // clean failure. 1<<20 per axis / 1<<26 texels (256MB RGBA) is far
    // beyond any real texture.
    if (width > (1 << 20) || height > (1 << 20) ||
        (size_t)width * (size_t)height > ((size_t)1 << 26)) {
        img.error = "PNG dimensions exceed the hostile-input bound";
        return false;
    }
    int bps = bit_depth / 8;
    int bpp = ch * bps;
    size_t stride = (size_t)width * bpp;

    // Adam7 pass grid: {x0, y0, dx, dy}; non-interlaced = one full pass.
    static const int kAdam7[7][4] = {
        {0, 0, 8, 8}, {4, 0, 8, 8}, {0, 4, 4, 8}, {2, 0, 4, 4},
        {0, 2, 2, 4}, {1, 0, 2, 2}, {0, 1, 1, 2},
    };
    struct Pass { int x0, y0, dx, dy, pw, ph; };
    std::vector<Pass> passes;
    if (interlace) {
        for (auto &p : kAdam7) {
            int pw = (width - p[0] + p[2] - 1) / p[2];
            int ph = (height - p[1] + p[3] - 1) / p[3];
            if (pw > 0 && ph > 0) passes.push_back({p[0], p[1], p[2], p[3], pw, ph});
        }
    } else {
        passes.push_back({0, 0, 1, 1, width, height});
    }
    size_t raw_size = 0;
    for (auto &p : passes) raw_size += (size_t)p.ph * ((size_t)p.pw * bpp + 1);
    std::vector<uint8_t> raw(raw_size);
    uLongf out_len = (uLongf)raw_size;
    if (uncompress(raw.data(), &out_len, idat.data(), (uLong)idat.size()) != Z_OK ||
        out_len != raw_size) {
        img.error = "zlib inflate failed";
        return false;
    }
    // Unfilter each pass' sub-image, scattering onto the pass grid.
    std::vector<uint8_t> rows((size_t)height * stride);
    std::vector<uint8_t> sub;
    size_t rpos = 0;
    for (auto &p : passes) {
        size_t pstride = (size_t)p.pw * bpp;
        sub.assign((size_t)p.ph * pstride, 0);
        for (int y = 0; y < p.ph; ++y) {
            uint8_t ftype = raw[rpos];
            const uint8_t *src = &raw[rpos + 1];
            rpos += pstride + 1;
            uint8_t *dst = &sub[(size_t)y * pstride];
            const uint8_t *prev = y ? &sub[(size_t)(y - 1) * pstride] : nullptr;
            for (size_t x = 0; x < pstride; ++x) {
                int a = x >= (size_t)bpp ? dst[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                int c = (prev && x >= (size_t)bpp) ? prev[x - bpp] : 0;
                int val = src[x];
                switch (ftype) {
                    case 0: break;
                    case 1: val += a; break;
                    case 2: val += b; break;
                    case 3: val += (a + b) >> 1; break;
                    case 4: {
                        int pa = abs(b - c), pb = abs(a - c), pc = abs(a + b - 2 * c);
                        val += (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                        break;
                    }
                    default:
                        img.error = "bad filter type";
                        return false;
                }
                dst[x] = (uint8_t)val;
            }
        }
        for (int y = 0; y < p.ph; ++y) {
            int iy = p.y0 + y * p.dy;
            for (int x = 0; x < p.pw; ++x) {
                int ix = p.x0 + x * p.dx;
                memcpy(&rows[(size_t)iy * stride + (size_t)ix * bpp],
                       &sub[((size_t)y * p.pw + x) * bpp], bpp);
            }
        }
    }
    // Expand to RGBA8 (16-bit keeps the high byte, like stb).
    img.width = width;
    img.height = height;
    img.rgba.resize((size_t)width * height * 4);
    for (int y = 0; y < height; ++y) {
        for (int x = 0; x < width; ++x) {
            const uint8_t *px = &rows[(size_t)y * stride + (size_t)x * bpp];
            uint8_t *o = &img.rgba[((size_t)y * width + x) * 4];
            uint8_t s[4] = {0, 0, 0, 255};
            for (int k = 0; k < ch; ++k) s[k] = px[k * bps];
            switch (color_type) {
                case 0: o[0] = o[1] = o[2] = s[0]; o[3] = 255; break;
                case 2: o[0] = s[0]; o[1] = s[1]; o[2] = s[2]; o[3] = 255; break;
                case 3: {
                    int idx = s[0];
                    if ((size_t)idx * 3 + 2 < palette.size()) {
                        o[0] = palette[idx * 3];
                        o[1] = palette[idx * 3 + 1];
                        o[2] = palette[idx * 3 + 2];
                    }
                    o[3] = (size_t)idx < trns.size() ? trns[idx] : 255;
                    break;
                }
                case 4: o[0] = o[1] = o[2] = s[0]; o[3] = s[1]; break;
                case 6: o[0] = s[0]; o[1] = s[1]; o[2] = s[2]; o[3] = s[3]; break;
            }
        }
    }
    return true;
}

}  // namespace

// ------------------------------------------------------------- C ABI ----

extern "C" {

void *mrt_obj_parse(const char *path) {
    // No C++ exception may cross the C boundary (see mrt_gltf_parse).
    try {
        return obj_parse_impl(path);
    } catch (const std::exception &e) {
        auto *h = new (std::nothrow) ObjFile();
        if (h) h->error = std::string("obj: ") + e.what();
        return h;
    }
}

const char *mrt_obj_error(void *h) {
    auto *o = (ObjFile *)h;
    return o->error.empty() ? nullptr : o->error.c_str();
}

void mrt_obj_free(void *h) { delete (ObjFile *)h; }

int mrt_obj_num_meshes(void *h) { return (int)((ObjFile *)h)->meshes.size(); }

void mrt_obj_mesh_info(void *h, int i, int *num_vertices, int *num_indices,
                       int *material_idx, int *has_uv, int *has_normal) {
    const Mesh &m = ((ObjFile *)h)->meshes[i];
    *num_vertices = (int)(m.positions.size() / 3);
    *num_indices = (int)m.indices.size();
    *material_idx = m.material_idx;
    *has_uv = m.has_uv ? 1 : 0;
    *has_normal = m.has_normal ? 1 : 0;
}

void mrt_obj_mesh_data(void *h, int i, float *positions, float *uvs,
                       float *normals, uint32_t *indices) {
    const Mesh &m = ((ObjFile *)h)->meshes[i];
    if (positions && !m.positions.empty())
        memcpy(positions, m.positions.data(), m.positions.size() * sizeof(float));
    if (uvs && !m.uvs.empty())
        memcpy(uvs, m.uvs.data(), m.uvs.size() * sizeof(float));
    if (normals && !m.normals.empty())
        memcpy(normals, m.normals.data(), m.normals.size() * sizeof(float));
    if (indices && !m.indices.empty())
        memcpy(indices, m.indices.data(), m.indices.size() * sizeof(uint32_t));
}

int mrt_obj_num_materials(void *h) {
    return (int)((ObjFile *)h)->materials.size();
}

void mrt_obj_material(void *h, int i, float *color4, float *roughness,
                      float *metalness, char *tex_path, int tex_path_cap) {
    const Material &m = ((ObjFile *)h)->materials[i];
    memcpy(color4, m.color, 4 * sizeof(float));
    *roughness = m.roughness;
    *metalness = m.metalness;
    if (tex_path_cap > 0) {
        strncpy(tex_path, m.tex_path.c_str(), tex_path_cap - 1);
        tex_path[tex_path_cap - 1] = '\0';
    }
}

// PNG: two-phase (size probe, then decode into caller buffer).
int mrt_png_size(const uint8_t *data, long n, int *w, int *hgt) {
    PngImage img;
    // Header-only probe: parse IHDR without inflating.
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
    if (n < 33 || memcmp(data, sig, 8) != 0) return -1;
    if (memcmp(data + 12, "IHDR", 4) != 0) return -1;
    uint32_t uw = be32(data + 16);
    uint32_t uh = be32(data + 20);
    // Hostile-dimension bound at the probe: callers size their output
    // allocation from these values before any pixel data is validated
    // (and unbounded be32 values would overflow the int casts below).
    if (uw == 0 || uh == 0 || uw > (1u << 20) || uh > (1u << 20) ||
        (uint64_t)uw * uh > (1ull << 26)) {
        return -1;
    }
    *w = (int)uw;
    *hgt = (int)uh;
    return 0;
}

// Decode into a caller buffer sized for expected_w x expected_h RGBA8
// (from mrt_png_size). Fails rather than overrunning if the decoded
// dimensions differ from the probe for any reason.
int mrt_png_decode(const uint8_t *data, long n, uint8_t *out_rgba,
                   int expected_w, int expected_h) {
    PngImage img;
    if (!png_decode_impl(data, (size_t)n, img)) return -1;
    if (img.width != expected_w || img.height != expected_h) return -2;
    size_t need = (size_t)expected_w * expected_h * 4;
    if (img.rgba.size() != need) return -2;
    memcpy(out_rgba, img.rgba.data(), need);
    return 0;
}

}  // extern "C"
