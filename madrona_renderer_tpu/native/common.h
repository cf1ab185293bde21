// Shared asset-importer types (C ABI handle layout) — used by the OBJ
// parser (importer.cpp) and the GLB/glTF parser (gltf.cpp). The Python
// bindings treat the handle as opaque and read it back through the
// mrt_obj_* accessors, so both parsers fill the same ObjFile.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

struct Material {
    std::string name;
    float color[4] = {1.f, 1.f, 1.f, 1.f};
    float roughness = 0.8f;
    float metalness = 0.2f;
    std::string tex_path;
    // Embedded (GLB) textures decode straight to RGBA8; empty for
    // path-referenced textures.
    int tex_w = 0, tex_h = 0;
    std::vector<uint8_t> tex_rgba;
};

struct Mesh {
    std::vector<float> positions;  // 3 per vertex
    std::vector<float> uvs;        // 2 per vertex (empty if none)
    std::vector<float> normals;    // 3 per vertex (empty if none)
    std::vector<uint32_t> indices;
    int32_t material_idx = -1;
    bool has_uv = false;
    bool has_normal = false;
};

struct ObjFile {
    std::vector<Mesh> meshes;
    std::vector<Material> materials;
    std::string error;
};

extern "C" {
// PNG decoder (importer.cpp): probe size, then decode RGBA8 into a
// caller buffer of w*h*4 bytes. Both return nonzero on failure.
int mrt_png_size(const uint8_t *data, long len, int *w, int *h);
int mrt_png_decode(const uint8_t *data, long len, uint8_t *out, int w,
                   int h);
}
