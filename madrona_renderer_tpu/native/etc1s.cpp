// BasisLZ / ETC1S decoder: KTX2 supercompressionScheme 1 → RGBA8.
//
// The reference accepts any KTX2 that libktx can transcode — including
// BasisLZ/ETC1S, the common "universal" compressed-texture case
// (reference src/mgr.cpp:199-212 via ktx::loadKTXMem → BC7). The TPU
// pipeline samples raw RGBA8 texels, so this decoder goes straight from
// the BasisLZ bitstream to RGBA8, no intermediate GPU block format.
//
// Format layers, and how each was sourced (zero-egress sandbox — no
// reference implementation or sample files were available):
//   * KTX2 container + basisLZGlobalData layout (endpoint/selector counts,
//     byte lengths, imageDescs): per the Khronos KTX 2.0 specification.
//   * ETC1S block → RGBA8 math (5:5:5 base expand, the 8 ETC1 intensity
//     modifier tables, clamped adds): per the Khronos ETC1 specification.
//   * The entropy layer (DEFLATE-style canonical Huffman with the 21-code
//     length alphabet, DPCM endpoint palettes, selector palettes, 2×2
//     macroblock endpoint prediction, delta-coded endpoint indices): per
//     the published Basis Universal .basis/ETC1S format documentation,
//     reconstructed here to the best of available detail and validated
//     round-trip against this repo's conforming encoder
//     (assets/etc1s_encode.py). Streams using features outside the
//     implemented subset (global/hybrid selector codebooks, selector
//     history buffers, P-frames) fail LOUDLY with a clear error — never
//     silently misdecode.
//
// Exposed C ABI: mrt_basislz_decode (see bottom).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Err {
    std::string msg;
    bool fail(const std::string &m) {
        if (msg.empty()) msg = m;
        return false;
    }
};

// ---------------------------------------------------------------- bits --
// LSB-first bit reader (DEFLATE convention: first bit read is the least
// significant bit of the current byte).
struct BitReader {
    const uint8_t *data;
    size_t len;
    size_t byte_pos = 0;
    int bit_pos = 0;
    bool overrun = false;

    BitReader(const uint8_t *d, size_t n) : data(d), len(n) {}

    int get_bit() {
        if (byte_pos >= len) {
            overrun = true;
            return 0;
        }
        int b = (data[byte_pos] >> bit_pos) & 1;
        if (++bit_pos == 8) {
            bit_pos = 0;
            ++byte_pos;
        }
        return b;
    }

    uint32_t get_bits(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; ++i) v |= (uint32_t)get_bit() << i;
        return v;
    }
};

// ------------------------------------------------------------- huffman --
// Canonical Huffman decoder. Codes are read bit-by-bit MSB-of-code-first
// (each read bit extends the code at the bottom), matching the canonical
// assignment: by increasing length, then increasing symbol index.
struct HuffDecoder {
    // first_code[len], first_index[len], and symbols sorted by (len, sym).
    uint32_t first_code[18] = {0};
    int first_index[18] = {0};
    int count[18] = {0};
    std::vector<int> sorted_syms;
    bool empty = true;

    bool init(const std::vector<uint8_t> &lens, Err &err) {
        int n = (int)lens.size();
        int total = 0;
        for (int l = 1; l <= 16; ++l) count[l] = 0;
        for (int i = 0; i < n; ++i) {
            if (lens[i] > 16) return err.fail("huffman: code length > 16");
            if (lens[i]) ++count[lens[i]], ++total;
        }
        empty = total == 0;
        if (empty) return true;
        // Kraft check + canonical first codes.
        uint32_t code = 0;
        int index = 0;
        for (int l = 1; l <= 16; ++l) {
            first_code[l] = code;
            first_index[l] = index;
            code = (code + count[l]) << 1;
            index += count[l];
        }
        if (total > 1 && (first_code[16] + count[16]) > (1u << 16))
            return err.fail("huffman: over-subscribed code");
        sorted_syms.resize(total);
        int pos[18];
        for (int l = 1; l <= 16; ++l) pos[l] = first_index[l];
        for (int i = 0; i < n; ++i)
            if (lens[i]) sorted_syms[pos[lens[i]]++] = i;
        return true;
    }

    int decode(BitReader &br, Err &err) {
        if (empty) {
            err.fail("huffman: decode from empty table");
            return -1;
        }
        // Degenerate single-symbol table: encoded as one 1-bit code.
        uint32_t code = 0;
        for (int l = 1; l <= 16; ++l) {
            code = (code << 1) | (uint32_t)br.get_bit();
            if (br.overrun) {
                err.fail("huffman: bitstream overrun");
                return -1;
            }
            if (count[l] && code - first_code[l] < (uint32_t)count[l])
                return sorted_syms[first_index[l] + (code - first_code[l])];
        }
        err.fail("huffman: invalid code");
        return -1;
    }
};

// The 21-symbol code-length alphabet and its transmission order
// (special run symbols first, then lengths interleaved from the middle).
constexpr int kSmallZeroRun = 17, kBigZeroRun = 18;
constexpr int kSmallRepeat = 19, kBigRepeat = 20;
constexpr int kTotalClenCodes = 21;
constexpr int kClenOrder[kTotalClenCodes] = {
    17, 18, 19, 20, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15, 16,
};

bool read_huffman_table(BitReader &br, HuffDecoder &out, Err &err) {
    uint32_t total_used_syms = br.get_bits(14);
    if (br.overrun) return err.fail("huffman table: overrun");
    if (!total_used_syms) {
        out.empty = true;
        return true;
    }
    uint32_t num_clen = br.get_bits(5);
    if (num_clen > kTotalClenCodes)
        return err.fail("huffman table: bad codelength-code count");
    std::vector<uint8_t> clen_sizes(kTotalClenCodes, 0);
    for (uint32_t i = 0; i < num_clen; ++i)
        clen_sizes[kClenOrder[i]] = (uint8_t)br.get_bits(3);
    HuffDecoder clen;
    if (!clen.init(clen_sizes, err)) return false;
    std::vector<uint8_t> lens(total_used_syms, 0);
    uint32_t cur = 0;
    uint8_t prev_nonzero = 0;
    while (cur < total_used_syms) {
        int sym = clen.decode(br, err);
        if (sym < 0) return false;
        if (sym <= 16) {
            lens[cur++] = (uint8_t)sym;
            if (sym) prev_nonzero = (uint8_t)sym;
        } else {
            uint32_t run;
            uint8_t fill = 0;
            if (sym == kSmallZeroRun) run = 3 + br.get_bits(3);
            else if (sym == kBigZeroRun) run = 11 + br.get_bits(7);
            else if (sym == kSmallRepeat) run = 3 + br.get_bits(2), fill = prev_nonzero;
            else run = 7 + br.get_bits(7), fill = prev_nonzero;
            if ((sym == kSmallRepeat || sym == kBigRepeat) && !prev_nonzero)
                return err.fail("huffman table: repeat with no prior code");
            if (cur + run > total_used_syms)
                return err.fail("huffman table: run past symbol count");
            for (uint32_t i = 0; i < run; ++i) lens[cur++] = fill;
        }
    }
    return out.init(lens, err);
}

// --------------------------------------------------------------- etc1s --
// Khronos ETC1 intensity modifier tables, indexed [inten][selector] with
// selectors ordered {-b, -a, +a, +b}.
constexpr int kInten[8][4] = {
    {-8, -2, 2, 8},       {-17, -5, 5, 17},   {-29, -9, 9, 29},
    {-42, -13, 13, 42},   {-60, -18, 18, 60}, {-80, -24, 24, 80},
    {-106, -33, 33, 106}, {-183, -47, 47, 183},
};

inline uint8_t expand5(int v) { return (uint8_t)((v << 3) | (v >> 2)); }
inline uint8_t clamp255(int v) { return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v)); }

struct Endpoint {
    uint8_t r5, g5, b5, inten;
};

// Selector block: 16 2-bit codes, sel[y*4+x].
struct Selector {
    uint8_t sel[16];
};

bool decode_endpoints(const uint8_t *d, size_t n, int count,
                      std::vector<Endpoint> &out, Err &err) {
    BitReader br(d, n);
    HuffDecoder color_model[3], inten_model;
    for (int i = 0; i < 3; ++i)
        if (!read_huffman_table(br, color_model[i], err)) return false;
    if (!read_huffman_table(br, inten_model, err)) return false;
    int grayscale = br.get_bit();
    out.resize(count);
    int prev[3] = {16, 16, 16};
    int prev_inten = 0;
    for (int i = 0; i < count; ++i) {
        int di = inten_model.decode(br, err);
        if (di < 0) return false;
        prev_inten = (prev_inten + di) & 7;
        out[i].inten = (uint8_t)prev_inten;
        int nchan = grayscale ? 1 : 3;
        for (int c = 0; c < nchan; ++c) {
            // Model selection by the previous component value's range.
            HuffDecoder &m = color_model[prev[c] <= 9 ? 0 : (prev[c] <= 21 ? 1 : 2)];
            int delta = m.decode(br, err);
            if (delta < 0) return false;
            prev[c] = (prev[c] + delta) & 31;
        }
        out[i].r5 = (uint8_t)prev[0];
        out[i].g5 = grayscale ? out[i].r5 : (uint8_t)prev[1];
        out[i].b5 = grayscale ? out[i].r5 : (uint8_t)prev[2];
    }
    if (br.overrun) return err.fail("endpoint palette: overrun");
    return true;
}

bool decode_selectors(const uint8_t *d, size_t n, int count,
                      std::vector<Selector> &out, Err &err) {
    BitReader br(d, n);
    int used_global = br.get_bit();
    int used_hybrid = br.get_bit();
    if (used_global || used_hybrid)
        return err.fail(
            "BasisLZ: global/hybrid selector codebooks are not supported "
            "by this decoder (raw selector palettes only)");
    int used_raw = br.get_bit();
    if (!used_raw)
        return err.fail(
            "BasisLZ: delta-coded selector palettes are not supported by "
            "this decoder (raw selector palettes only)");
    out.resize(count);
    for (int i = 0; i < count; ++i) {
        for (int y = 0; y < 4; ++y) {
            uint32_t row = br.get_bits(8);
            for (int x = 0; x < 4; ++x)
                out[i].sel[y * 4 + x] = (uint8_t)((row >> (x * 2)) & 3);
        }
    }
    if (br.overrun) return err.fail("selector palette: overrun");
    return true;
}

struct SliceTables {
    HuffDecoder endpoint_pred, delta_endpoint, selector, selector_history_rle;
    uint32_t selector_history_size = 0;
};

bool decode_tables(const uint8_t *d, size_t n, SliceTables &t, Err &err) {
    BitReader br(d, n);
    if (!read_huffman_table(br, t.endpoint_pred, err)) return false;
    if (!read_huffman_table(br, t.delta_endpoint, err)) return false;
    if (!read_huffman_table(br, t.selector, err)) return false;
    if (!read_huffman_table(br, t.selector_history_rle, err)) return false;
    t.selector_history_size = br.get_bits(13);
    if (t.selector_history_size)
        return err.fail(
            "BasisLZ: selector history buffers are not supported by this "
            "decoder");
    if (br.overrun) return err.fail("tables: overrun");
    return true;
}

// Endpoint prediction codes per block (2 bits each, four per 2×2 group).
constexpr int kPredLeft = 0, kPredAbove = 1, kPredExplicit = 3;

bool decode_slice(const uint8_t *d, size_t n, int width, int height,
                  const std::vector<Endpoint> &endpoints,
                  const std::vector<Selector> &selectors,
                  SliceTables &tables, uint8_t *out_rgba, Err &err) {
    int bw = (width + 3) / 4, bh = (height + 3) / 4;
    BitReader br(d, n);
    std::vector<int> row_ep((size_t)bw, 0);  // previous row's endpoint idx
    std::vector<int> cur_row_ep((size_t)bw, 0);
    int prev_ep = 0;
    int num_ep = (int)endpoints.size();
    int num_sel = (int)selectors.size();
    // One prediction byte per 2×2 block group, decoded at the group's
    // upper-left block; a row of group bytes persists so the group's
    // lower blocks (next block row) read their slots.
    std::vector<uint32_t> group_preds((size_t)(bw + 1) / 2, 0);

    for (int by = 0; by < bh; ++by) {
        for (int bx = 0; bx < bw; ++bx) {
            if ((bx % 2 == 0) && (by % 2 == 0)) {
                int sym = tables.endpoint_pred.decode(br, err);
                if (sym < 0) return false;
                group_preds[bx / 2] = (uint32_t)sym;
            }
            int slot = (by % 2) * 2 + (bx % 2);
            int pred = (int)((group_preds[bx / 2] >> (slot * 2)) & 3);

            int ep;
            if (pred == kPredLeft) {
                if (bx == 0) return err.fail("slice: left-pred in column 0");
                ep = cur_row_ep[bx - 1];
            } else if (pred == kPredAbove) {
                if (by == 0) return err.fail("slice: above-pred in row 0");
                ep = row_ep[bx];
            } else if (pred == kPredExplicit) {
                int delta = tables.delta_endpoint.decode(br, err);
                if (delta < 0) return false;
                ep = (prev_ep + delta) % num_ep;
            } else {
                return err.fail(
                    "BasisLZ: endpoint prediction mode 2 (CR/near-repeat) "
                    "is not supported by this decoder");
            }
            prev_ep = ep;
            cur_row_ep[bx] = ep;
            if (ep >= num_ep) return err.fail("slice: endpoint index range");

            int sidx = tables.selector.decode(br, err);
            if (sidx < 0) return false;
            if (sidx >= num_sel)
                return err.fail(
                    "BasisLZ: selector history symbols are not supported "
                    "by this decoder");

            const Endpoint &e = endpoints[ep];
            const Selector &s = selectors[sidx];
            int base[3] = {expand5(e.r5), expand5(e.g5), expand5(e.b5)};
            const int *mods = kInten[e.inten];
            for (int py = 0; py < 4; ++py) {
                int y = by * 4 + py;
                if (y >= height) break;
                for (int px = 0; px < 4; ++px) {
                    int x = bx * 4 + px;
                    if (x >= width) break;
                    int m = mods[s.sel[py * 4 + px]];
                    uint8_t *p = out_rgba + ((size_t)y * width + x) * 4;
                    p[0] = clamp255(base[0] + m);
                    p[1] = clamp255(base[1] + m);
                    p[2] = clamp255(base[2] + m);
                    p[3] = 255;
                }
            }
        }
        std::swap(row_ep, cur_row_ep);
    }
    if (br.overrun) return err.fail("slice: overrun");
    return true;
}

// KTX2 basisLZGlobalData parse + full decode.
bool basislz_decode_impl(const uint8_t *sgd, size_t sgd_len,
                         const uint8_t *level, size_t level_len, int width,
                         int height, uint8_t *out_rgba, Err &err) {
    if (sgd_len < 20) return err.fail("BasisLZ: global data too short");
    uint16_t endpoint_count, selector_count;
    uint32_t endpoints_len, selectors_len, tables_len, extended_len;
    memcpy(&endpoint_count, sgd, 2);
    memcpy(&selector_count, sgd + 2, 2);
    memcpy(&endpoints_len, sgd + 4, 4);
    memcpy(&selectors_len, sgd + 8, 4);
    memcpy(&tables_len, sgd + 12, 4);
    memcpy(&extended_len, sgd + 16, 4);
    // imageDescs: one per image; single-level 2D non-array → 1.
    size_t desc_off = 20;
    if (sgd_len < desc_off + 20) return err.fail("BasisLZ: missing imageDesc");
    uint32_t image_flags, rgb_off, rgb_len, alpha_off, alpha_len;
    memcpy(&image_flags, sgd + desc_off, 4);
    memcpy(&rgb_off, sgd + desc_off + 4, 4);
    memcpy(&rgb_len, sgd + desc_off + 8, 4);
    memcpy(&alpha_off, sgd + desc_off + 12, 4);
    memcpy(&alpha_len, sgd + desc_off + 16, 4);
    if (image_flags & 0x02)
        return err.fail("BasisLZ: P-frames (texture video) not supported");
    size_t blobs = desc_off + 20;
    if (blobs + (size_t)endpoints_len + selectors_len + tables_len +
            extended_len > sgd_len)
        return err.fail("BasisLZ: global data blob lengths exceed sgd");
    const uint8_t *ep_data = sgd + blobs;
    const uint8_t *sel_data = ep_data + endpoints_len;
    const uint8_t *tab_data = sel_data + selectors_len;
    if ((size_t)rgb_off + rgb_len > level_len)
        return err.fail("BasisLZ: rgb slice outside level data");
    if (!endpoint_count || !selector_count)
        return err.fail("BasisLZ: empty codebooks");

    std::vector<Endpoint> endpoints;
    std::vector<Selector> selectors;
    SliceTables tables;
    if (!decode_endpoints(ep_data, endpoints_len, endpoint_count, endpoints, err))
        return false;
    if (!decode_selectors(sel_data, selectors_len, selector_count, selectors, err))
        return false;
    if (!decode_tables(tab_data, tables_len, tables, err)) return false;
    return decode_slice(level + rgb_off, rgb_len, width, height, endpoints,
                        selectors, tables, out_rgba, err);
}

thread_local std::string g_basislz_err;

}  // namespace

extern "C" {

// Decode a KTX2 BasisLZ (ETC1S) image: sgd = supercompressionGlobalData,
// level = the mip level's byte range, out_rgba sized width*height*4.
// Returns 0 on success; on failure returns -1 and mrt_basislz_error()
// describes why (unsupported feature vs corrupt stream).
int mrt_basislz_decode(const uint8_t *sgd, long sgd_len, const uint8_t *level,
                       long level_len, int width, int height,
                       uint8_t *out_rgba) {
    Err err;
    if (width <= 0 || height <= 0) {
        g_basislz_err = "bad dimensions";
        return -1;
    }
    if (!basislz_decode_impl(sgd, (size_t)sgd_len, level, (size_t)level_len,
                             width, height, out_rgba, err)) {
        g_basislz_err = err.msg.empty() ? "decode failed" : err.msg;
        return -1;
    }
    g_basislz_err.clear();
    return 0;
}

const char *mrt_basislz_error() {
    return g_basislz_err.empty() ? nullptr : g_basislz_err.c_str();
}

}  // extern "C"
