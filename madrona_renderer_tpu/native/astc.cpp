// Standard-ASTC LDR block decoder (C++ twin of assets/astc.py).
//
// Second implementation of the same published-spec machinery — the
// Khronos Data Format Specification's ASTC LDR section — written as an
// independent transcription and differential-fuzzed against the Python
// decoder in CI (tests/test_astc_differential.py), the same two-reading
// pattern as etc1s.cpp vs assets/etc1s_decode.py. Also the fast path
// for init-time decode of large ASTC KTX2 payloads.
//
// Provenance: see assets/astc.py's module docstring — the arbitrary
// constants (trit/quint packings, unquantization swizzles, the
// partition hash) are pinned there by spec-guaranteed invariants; this
// file must match it bit-for-bit on every input (valid or hostile).
//
// Scope (identical to the Python tier): LDR 2D blocks, CEMs
// 0/4/6/8/10/12, shared-CEM multi-partition, dual-plane, void-extent.
// HDR and mixed CEM classes fail loudly.

#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

thread_local char g_err[256];

void set_err(const char* msg) {
    std::snprintf(g_err, sizeof(g_err), "%s", msg);
}

struct Bits128 {
    uint64_t lo, hi;
    int pos = 0;
    bool overrun = false;

    uint32_t read(int n) {
        if (pos + n > 128) { overrun = true; return 0; }
        uint64_t v;
        if (pos >= 64) {
            v = hi >> (pos - 64);
        } else if (pos + n <= 64) {
            v = lo >> pos;
        } else {
            v = (lo >> pos) | (hi << (64 - pos));
        }
        pos += n;
        return (uint32_t)(v & ((n == 64) ? ~0ull : ((1ull << n) - 1)));
    }
};

// ---- trit / quint block decode (spec pseudo-code) -------------------

void decode_trits(uint32_t T, int t[5]) {
    auto bits = [&](int lo, int hi) {
        return (int)((T >> lo) & ((1u << (hi - lo + 1)) - 1));
    };
    int C;
    if (bits(2, 4) == 0b111) {
        C = (bits(5, 7) << 2) | bits(0, 1);
        t[4] = t[3] = 2;
    } else {
        C = bits(0, 4);
        if (bits(5, 6) == 0b11) {
            t[4] = 2;
            t[3] = bits(7, 7);
        } else {
            t[4] = bits(7, 7);
            t[3] = bits(5, 6);
        }
    }
    auto cb = [&](int lo, int hi) {
        return (C >> lo) & ((1 << (hi - lo + 1)) - 1);
    };
    if (cb(0, 1) == 0b11) {
        t[2] = 2;
        t[1] = cb(4, 4);
        t[0] = (cb(3, 3) << 1) | (cb(2, 2) & ~cb(3, 3) & 1);
    } else if (cb(2, 3) == 0b11) {
        t[2] = 2;
        t[1] = 2;
        t[0] = cb(0, 1);
    } else {
        t[2] = cb(4, 4);
        t[1] = cb(2, 3);
        t[0] = cb(0, 1);
    }
}

void decode_quints(uint32_t Q, int q[3]) {
    auto bits = [&](int lo, int hi) {
        return (int)((Q >> lo) & ((1u << (hi - lo + 1)) - 1));
    };
    if (bits(1, 2) == 0b11 && bits(5, 6) == 0b00) {
        q[2] = (bits(0, 0) << 2) | ((bits(4, 4) & ~bits(0, 0) & 1) << 1)
             | (bits(3, 3) & ~bits(0, 0) & 1);
        q[1] = 4;
        q[0] = 4;
    } else {
        int C;
        if (bits(1, 2) == 0b11) {
            q[2] = 4;
            C = (bits(3, 4) << 3) | ((~bits(5, 6) & 0b11) << 1) | bits(0, 0);
        } else {
            q[2] = bits(5, 6);
            C = bits(0, 4);
        }
        auto cb = [&](int lo, int hi) {
            return (C >> lo) & ((1 << (hi - lo + 1)) - 1);
        };
        if (cb(0, 2) == 0b101) {
            q[1] = 4;
            q[0] = cb(3, 4);
        } else {
            q[1] = cb(3, 4);
            q[0] = cb(0, 2);
        }
    }
}

// ---- quantization ranges --------------------------------------------

struct Range { int levels, bits, trits, quints; };

const Range EP_RANGES[21] = {
    {2,1,0,0},{3,0,1,0},{4,2,0,0},{5,0,0,1},{6,1,1,0},{8,3,0,0},
    {10,1,0,1},{12,2,1,0},{16,4,0,0},{20,2,0,1},{24,3,1,0},{32,5,0,0},
    {40,3,0,1},{48,4,1,0},{64,6,0,0},{80,4,0,1},{96,5,1,0},{128,7,0,0},
    {160,5,0,1},{192,6,1,0},{256,8,0,0},
};
const Range WT_RANGES[12] = {
    {2,1,0,0},{3,0,1,0},{4,2,0,0},{5,0,0,1},{6,1,1,0},{8,3,0,0},
    {10,1,0,1},{12,2,1,0},{16,4,0,0},{20,2,0,1},{24,3,1,0},{32,5,0,0},
};

int ise_bits(int count, const Range& r) {
    if (r.trits) return (8 * count + 4) / 5 + count * r.bits;
    if (r.quints) return (7 * count + 2) / 3 + count * r.bits;
    return count * r.bits;
}

// decode `count` ISE values into (digit, m) pairs
const int TRIT_SPLITS[5] = {2, 2, 1, 2, 1};
const int QUINT_SPLITS[3] = {3, 2, 2};

bool ise_decode(Bits128& br, int count, const Range& r,
                int* digits, int* ms) {
    if (!r.trits && !r.quints) {
        for (int i = 0; i < count; i++) {
            digits[i] = 0;
            ms[i] = br.read(r.bits);
        }
        return !br.overrun;
    }
    int group = r.trits ? 5 : 3;
    const int* splits = r.trits ? TRIT_SPLITS : QUINT_SPLITS;
    int i = 0;
    while (i < count) {
        int g = (count - i < group) ? (count - i) : group;
        uint32_t packed = 0;
        int pb = 0;
        int local_m[5];
        for (int j = 0; j < g; j++) {
            local_m[j] = br.read(r.bits);
            packed |= br.read(splits[j]) << pb;
            pb += splits[j];
        }
        int d[5];
        if (r.trits) decode_trits(packed, d);
        else {
            int q[3];
            decode_quints(packed, q);
            d[0] = q[0]; d[1] = q[1]; d[2] = q[2];
        }
        for (int j = 0; j < g; j++) {
            digits[i + j] = d[j];
            ms[i + j] = local_m[j];
        }
        i += g;
    }
    return !br.overrun;
}

// ---- unquantization ---------------------------------------------------

int bit(int v, int i) { return (v >> i) & 1; }

int unq_color(const Range& r, int d, int m) {
    if (!r.trits && !r.quints) {
        // bit replication to 8 bits
        int out = 0, shift = 8 - r.bits, v = m;
        while (shift > -r.bits) {
            out |= (shift >= 0) ? (v << shift) : (v >> -shift);
            shift -= r.bits;
        }
        return out & 0xFF;
    }
    int n = r.bits;
    int a = bit(m, 0);
    int A = a ? 0x1FF : 0;
    int B = 0, C = 0;
    if (r.trits) {
        switch (n) {
        case 1: B = 0; C = 204; break;
        case 2: {
            int b = bit(m, 1);
            B = (b << 8) | (b << 4) | (b << 2) | (b << 1);
            C = 93; break; }
        case 3: {
            int b = bit(m, 1), c = bit(m, 2);
            B = (c << 8) | (b << 7) | (c << 3) | (b << 2) | (c << 1) | b;
            C = 44; break; }
        case 4: {
            int b = bit(m, 1), c = bit(m, 2), dd = bit(m, 3);
            B = (dd << 8) | (c << 7) | (b << 6) | (dd << 2) | (c << 1) | b;
            C = 22; break; }
        case 5: {
            int b = bit(m, 1), c = bit(m, 2), dd = bit(m, 3), e = bit(m, 4);
            B = (e << 8) | (dd << 7) | (c << 6) | (b << 5) | (e << 1) | dd;
            C = 11; break; }
        case 6: {
            int b = bit(m, 1), c = bit(m, 2), dd = bit(m, 3), e = bit(m, 4),
                f = bit(m, 5);
            B = (f << 8) | (e << 7) | (dd << 6) | (c << 5) | (b << 4) | f;
            C = 5; break; }
        default: return -1;
        }
    } else {
        switch (n) {
        case 1: B = 0; C = 113; break;
        case 2: {
            int b = bit(m, 1);
            B = (b << 8) | (b << 3) | (b << 2);
            C = 54; break; }
        case 3: {
            int b = bit(m, 1), c = bit(m, 2);
            B = (c << 8) | (b << 7) | (c << 2) | (b << 1) | c;
            C = 26; break; }
        case 4: {
            int b = bit(m, 1), c = bit(m, 2), dd = bit(m, 3);
            B = (dd << 8) | (c << 7) | (b << 6) | (dd << 1) | c;
            C = 13; break; }
        case 5: {
            int b = bit(m, 1), c = bit(m, 2), dd = bit(m, 3), e = bit(m, 4);
            B = (e << 8) | (dd << 7) | (c << 6) | (b << 5) | e;
            C = 6; break; }
        default: return -1;
        }
    }
    int v = d * C + B;
    v ^= A;
    return (A & 0x80) | (v >> 2);
}

int unq_weight(const Range& r, int d, int m) {
    if (!r.trits && !r.quints) {
        int out = 0, shift = 6 - r.bits, v = m;
        while (shift > -r.bits) {
            out |= (shift >= 0) ? (v << shift) : (v >> -shift);
            shift -= r.bits;
        }
        out &= 0x3F;
        return out > 32 ? out + 1 : out;
    }
    int n = r.bits;
    if (n == 0) return d * (r.trits ? 32 : 16);
    int a = bit(m, 0);
    int A = a ? 0x7F : 0;
    int B = 0, C = 0;
    if (r.trits) {
        switch (n) {
        case 1: B = 0; C = 50; break;
        case 2: {
            int b = bit(m, 1);
            B = (b << 6) | (b << 2) | b;
            C = 23; break; }
        case 3: {
            int b = bit(m, 1), c = bit(m, 2);
            B = (c << 6) | (b << 5) | (c << 1) | b;
            C = 11; break; }
        default: return -1;
        }
    } else {
        switch (n) {
        case 1: B = 0; C = 28; break;
        case 2: {
            int b = bit(m, 1);
            B = (b << 6) | (b << 1);
            C = 13; break; }
        default: return -1;
        }
    }
    int v = d * C + B;
    v ^= A;
    v = (A & 0x20) | (v >> 2);
    return v > 32 ? v + 1 : v;
}

// ---- partition hash ---------------------------------------------------

uint32_t hash52(uint32_t p) {
    p ^= p >> 15; p -= p << 17; p += p << 7; p += p << 4;
    p ^= p >> 5;  p += p << 16; p ^= p >> 7; p ^= p >> 3;
    p ^= p << 6;  p ^= p >> 17;
    return p;
}

int select_partition(int seed, int x, int y, int pc, bool small_block) {
    if (pc == 1) return 0;
    if (small_block) { x <<= 1; y <<= 1; }
    int z = 0;
    seed += (pc - 1) * 1024;
    uint32_t rnum = hash52((uint32_t)seed);
    int s[8];
    for (int i = 0; i < 8; i++) s[i] = (rnum >> (4 * i)) & 0xF;
    int s9 = (rnum >> 18) & 0xF, s10 = (rnum >> 22) & 0xF;
    int s11 = (rnum >> 26) & 0xF;
    int s12 = ((rnum >> 30) | (rnum << 2)) & 0xF;
    for (int i = 0; i < 8; i++) s[i] *= s[i];
    s9 *= s9; s10 *= s10; s11 *= s11; s12 *= s12;
    int sh1, sh2;
    if (seed & 1) {
        sh1 = (seed & 2) ? 4 : 5;
        sh2 = (pc == 3) ? 6 : 5;
    } else {
        sh1 = (pc == 3) ? 6 : 5;
        sh2 = (seed & 2) ? 4 : 5;
    }
    int sh3 = (seed & 0x10) ? sh1 : sh2;
    s[0] >>= sh1; s[1] >>= sh2; s[2] >>= sh1; s[3] >>= sh2;
    s[4] >>= sh1; s[5] >>= sh2; s[6] >>= sh1; s[7] >>= sh2;
    s9 >>= sh3; s10 >>= sh3; s11 >>= sh3; s12 >>= sh3;
    // Spec plane equations: x/y coefficients in seed pairs, s9-s12
    // z-only (cross-assigned 11/12/9/10; inert here with z = 0).
    int a = (s[0]*x + s[1]*y + s11*z + (int)(rnum >> 14)) & 0x3F;
    int b = (s[2]*x + s[3]*y + s12*z + (int)(rnum >> 10)) & 0x3F;
    int c = (s[4]*x + s[5]*y + s9*z + (int)(rnum >> 6)) & 0x3F;
    int d = (s[6]*x + s[7]*y + s10*z + (int)(rnum >> 2)) & 0x3F;
    if (pc <= 3) d = 0;
    if (pc <= 2) c = 0;
    if (a >= b && a >= c && a >= d) return 0;
    if (b >= c && b >= d) return 1;
    if (c >= d) return 2;
    return 3;
}

// ---- CEMs --------------------------------------------------------------

struct RGBA { int r, g, b, a; };

RGBA blue_contract(int r, int g, int b, int a) {
    return {(r + b) >> 1, (g + b) >> 1, b, a};
}

// spec bit_transfer_signed: a -> signed 6-bit offset, b gains a's MSB
void bit_transfer_signed(int& a, int& b) {
    b = (b >> 1) | (a & 0x80);
    a = (a >> 1) & 0x3F;
    if (a & 0x20) a -= 0x40;
}

int clamp_u8(int c) { return c < 0 ? 0 : (c > 255 ? 255 : c); }

RGBA clamp_rgba(RGBA e) {
    return {clamp_u8(e.r), clamp_u8(e.g), clamp_u8(e.b), clamp_u8(e.a)};
}

// returns false for unimplemented CEMs
bool decode_cem(int cem, const int* vin, RGBA& e0, RGBA& e1) {
    int v[8];
    for (int i = 0; i < 8; i++) v[i] = vin[i];
    switch (cem) {
    case 0:
        e0 = {v[0], v[0], v[0], 255};
        e1 = {v[1], v[1], v[1], 255};
        return true;
    case 1: {  // luminance, base+offset
        int l0 = (v[0] >> 2) | (v[1] & 0xC0);
        int l1 = l0 + (v[1] & 0x3F);
        if (l1 > 0xFF) l1 = 0xFF;
        e0 = {l0, l0, l0, 255};
        e1 = {l1, l1, l1, 255};
        return true; }
    case 4:
        e0 = {v[0], v[0], v[0], v[2]};
        e1 = {v[1], v[1], v[1], v[3]};
        return true;
    case 5: {  // luminance + alpha, base+offset
        bit_transfer_signed(v[1], v[0]);
        bit_transfer_signed(v[3], v[2]);
        e0 = clamp_rgba({v[0], v[0], v[0], v[2]});
        e1 = clamp_rgba({v[0] + v[1], v[0] + v[1], v[0] + v[1],
                         v[2] + v[3]});
        return true; }
    case 9:
    case 13: {  // RGB(A), base+offset
        bit_transfer_signed(v[1], v[0]);
        bit_transfer_signed(v[3], v[2]);
        bit_transfer_signed(v[5], v[4]);
        int a0 = 255, a1 = 255;
        if (cem == 13) {
            bit_transfer_signed(v[7], v[6]);
            a0 = v[6];
            a1 = v[6] + v[7];
        }
        if (v[1] + v[3] + v[5] >= 0) {
            e0 = {v[0], v[2], v[4], a0};
            e1 = {v[0] + v[1], v[2] + v[3], v[4] + v[5], a1};
        } else {
            e0 = blue_contract(v[0] + v[1], v[2] + v[3], v[4] + v[5], a1);
            e1 = blue_contract(v[0], v[2], v[4], a0);
        }
        e0 = clamp_rgba(e0);
        e1 = clamp_rgba(e1);
        return true; }
    case 6:
        e1 = {v[0], v[1], v[2], 255};
        e0 = {(v[0]*v[3]) >> 8, (v[1]*v[3]) >> 8, (v[2]*v[3]) >> 8, 255};
        return true;
    case 8:
    case 12: {
        int s0 = v[0] + v[2] + v[4];
        int s1 = v[1] + v[3] + v[5];
        int a0 = (cem == 12) ? v[6] : 255;
        int a1 = (cem == 12) ? v[7] : 255;
        if (s1 >= s0) {
            e0 = {v[0], v[2], v[4], a0};
            e1 = {v[1], v[3], v[5], a1};
        } else {
            e0 = blue_contract(v[1], v[3], v[5], a1);
            e1 = blue_contract(v[0], v[2], v[4], a0);
        }
        return true; }
    case 10:
        e1 = {v[0], v[1], v[2], v[5]};
        e0 = {(v[0]*v[3]) >> 8, (v[1]*v[3]) >> 8, (v[2]*v[3]) >> 8, v[4]};
        return true;
    default:
        return false;
    }
}

int interp_ch(int c0, int c1, int w, bool srgb_ch) {
    int C0 = srgb_ch ? ((c0 << 8) | 0x80) : ((c0 << 8) | c0);
    int C1 = srgb_ch ? ((c1 << 8) | 0x80) : ((c1 << 8) | c1);
    return (((C0 * (64 - w) + C1 * w + 32) >> 6) >> 8);
}

// ---- block mode --------------------------------------------------------

bool decode_block_mode(int bm, int& gw, int& gh, int& wrng, bool& dual) {
    int base = (bm >> 4) & 1;
    int H = (bm >> 9) & 1;
    int D = (bm >> 10) & 1;
    int A = (bm >> 5) & 3;
    if (bm & 3) {
        base |= (bm & 3) << 1;
        int B = (bm >> 7) & 3;
        switch ((bm >> 2) & 3) {
        case 0: gw = B + 4; gh = A + 2; break;
        case 1: gw = B + 8; gh = A + 2; break;
        case 2: gw = A + 2; gh = B + 8; break;
        case 3:
            B &= 1;
            if (bm & 0x100) { gw = B + 2; gh = A + 2; }
            else { gw = A + 2; gh = B + 6; }
            break;
        }
    } else {
        base |= ((bm >> 2) & 3) << 1;
        if (((bm >> 2) & 3) == 0) { set_err("ASTC: reserved block mode"); return false; }
        int B = (bm >> 9) & 3;
        switch ((bm >> 7) & 3) {
        case 0: gw = 12; gh = A + 2; break;
        case 1: gw = A + 2; gh = 12; break;
        case 2: gw = A + 6; gh = B + 6; D = 0; H = 0; break;
        case 3:
            // bits 10/9 still carry D/H here (only the (A+6)x(B+6)
            // row above repurposes them for B)
            switch ((bm >> 5) & 3) {
            case 0: gw = 6; gh = 10; break;
            case 1: gw = 10; gh = 6; break;
            default: set_err("ASTC: reserved block mode"); return false;
            }
            break;
        }
    }
    if (base < 2) { set_err("ASTC: reserved weight range"); return false; }
    wrng = (base - 2) + 6 * H;
    dual = D != 0;
    return true;
}

// ---- weight infill -----------------------------------------------------

void infill(const int* grid, int gw, int gh, int bw, int bh, int* out) {
    if (gw == bw && gh == bh) {
        std::memcpy(out, grid, sizeof(int) * bw * bh);
        return;
    }
    int ds = (1024 + bw / 2) / (bw - 1);
    int dt = (1024 + bh / 2) / (bh - 1);
    for (int t = 0; t < bh; t++) {
        for (int s = 0; s < bw; s++) {
            int gs = (ds * s * (gw - 1) + 32) >> 6;
            int gt = (dt * t * (gh - 1) + 32) >> 6;
            int js = gs >> 4, fs = gs & 0xF;
            int jt = gt >> 4, ft = gt & 0xF;
            int w11 = (fs * ft + 8) >> 4;
            int w10 = ft - w11;
            int w01 = fs - w11;
            int w00 = 16 - fs - ft + w11;
            auto g = [&](int y, int x) {
                if (y >= gh || x >= gw) return 0;
                return grid[y * gw + x];
            };
            out[t * bw + s] =
                (g(jt, js) * w00 + g(jt, js + 1) * w01 +
                 g(jt + 1, js) * w10 + g(jt + 1, js + 1) * w11 + 8) >> 4;
        }
    }
}

const int VOID_EXTENT_2D = 0x1FC;

bool decode_block(const uint8_t* blk, int bw, int bh, bool srgb,
                  uint8_t* out /* bh x bw x 4 */) {
    uint64_t lo, hi;
    std::memcpy(&lo, blk, 8);
    std::memcpy(&hi, blk + 8, 8);
    int bm = (int)(lo & 0x7FF);
    if ((bm & 0x1FF) == VOID_EXTENT_2D) {
        if ((lo >> 9) & 1) { set_err("ASTC: HDR void-extent block"); return false; }
        for (int c = 0; c < 4; c++) {
            uint16_t u16 = (uint16_t)(hi >> (16 * c));
            uint8_t v = (uint8_t)(u16 >> 8);
            for (int p = 0; p < bw * bh; p++) out[p * 4 + c] = v;
        }
        return true;
    }
    int gw, gh, wrng;
    bool dual;
    if (!decode_block_mode(bm, gw, gh, wrng, dual)) return false;
    if (gw > bw || gh > bh) {
        set_err("ASTC: weight grid exceeds block footprint");
        return false;
    }
    int part_count = (int)((lo >> 11) & 3) + 1;
    if (dual && part_count == 4) {
        set_err("ASTC: dual plane with 4 partitions is illegal");
        return false;
    }
    int n_weights = gw * gh * (dual ? 2 : 1);
    // spec limit: at most 64 weights per block (incl. the dual plane)
    if (n_weights > 64) { set_err("ASTC: too many weights"); return false; }
    const Range& wr = WT_RANGES[wrng];
    int wbits = ise_bits(n_weights, wr);
    if (wbits < 24 || wbits > 96) {
        set_err("ASTC: weight stream bit count is illegal");
        return false;
    }
    int below_weights = 128 - wbits;

    int seed = 0, ep_start;
    int cems[4];
    if (part_count == 1) {
        cems[0] = (int)((lo >> 13) & 0xF);
        ep_start = 17;
    } else {
        seed = (int)((lo >> 13) & 0x3FF);
        int cem_sel = (int)((lo >> 23) & 0x3F);
        ep_start = 29;
        if ((cem_sel & 3) == 0) {
            for (int i = 0; i < part_count; i++) cems[i] = cem_sel >> 2;
        } else {
            // Mixed per-partition CEMs (spec C.2.11): 2 selector bits +
            // P class bits + 2P mode-low bits; the first 6 bits are the
            // CEM field, the remaining 3P-4 sit directly below the
            // weight data (above the CCS when dual-plane).
            int highpart = 3 * part_count - 4;
            below_weights -= highpart;
            Bits128 brh{lo, hi};
            brh.pos = below_weights;
            int enc = cem_sel | ((int)brh.read(highpart) << 6);
            int base = (enc & 3) - 1;
            int bitpos = 2;
            for (int i = 0; i < part_count; i++) {
                cems[i] = (base + ((enc >> bitpos) & 1)) << 2;
                bitpos++;
            }
            for (int i = 0; i < part_count; i++) {
                cems[i] |= (enc >> bitpos) & 3;
                bitpos += 2;
            }
        }
    }
    for (int i = 0; i < part_count; i++) {
        int c = cems[i];
        if (c == 2 || c == 3 || c == 7 || c == 11 || c == 14 || c == 15) {
            set_err("ASTC: HDR endpoint mode");
            return false;
        }
    }

    int extra = dual ? 2 : 0;
    int ccs = 0;
    Bits128 brc{lo, hi};
    if (extra) {
        brc.pos = below_weights - extra;
        ccs = (int)brc.read(2);
    }
    int n_ep = 0;
    for (int i = 0; i < part_count; i++) n_ep += 2 * ((cems[i] >> 2) + 1);
    if (n_ep > 18) {
        set_err("ASTC: endpoint values exceed the 18-value cap");
        return false;
    }
    int avail = below_weights - extra - ep_start;
    if (avail < 0) {
        set_err("ASTC: endpoint field overruns the weight data");
        return false;
    }
    int ep_rng = -1;
    for (int ri = 20; ri > 3; ri--) {
        if (ise_bits(n_ep, EP_RANGES[ri]) <= avail) { ep_rng = ri; break; }
    }
    if (ep_rng < 0) {
        set_err("ASTC: no endpoint range fits the remaining bits");
        return false;
    }
    Bits128 bre{lo, hi};
    bre.pos = ep_start;
    int ep_d[32], ep_m[32];
    if (!ise_decode(bre, n_ep, EP_RANGES[ep_rng], ep_d, ep_m)) {
        set_err("ASTC: endpoint stream overrun");
        return false;
    }

    // weights: bit-reversed from the top of the block
    uint64_t rlo = 0, rhi = 0;
    for (int i = 0; i < 64; i++) {
        if ((hi >> i) & 1) rlo |= 1ull << (63 - i);
        if ((lo >> i) & 1) rhi |= 1ull << (63 - i);
    }
    Bits128 brw{rlo, rhi};
    int w_d[128], w_m[128];
    if (!ise_decode(brw, n_weights, wr, w_d, w_m)) {
        set_err("ASTC: weight stream overrun");
        return false;
    }

    int grid0[144], grid1[144];  // up to 12x12 block footprint
    int planes = dual ? 2 : 1;
    for (int pl = 0; pl < planes; pl++) {
        int tmp[64];
        for (int i = 0; i < gw * gh; i++) {
            int k = dual ? (2 * i + pl) : i;
            tmp[i] = unq_weight(wr, w_d[k], w_m[k]);
        }
        infill(tmp, gw, gh, bw, bh, pl == 0 ? grid0 : grid1);
    }

    RGBA e0s[4], e1s[4];
    int off = 0;  // per-partition value counts differ under mixed CEMs
    for (int s = 0; s < part_count; s++) {
        int per_sub = 2 * ((cems[s] >> 2) + 1);
        int vals[8] = {0, 0, 0, 0, 0, 0, 0, 0};
        for (int i = 0; i < per_sub; i++) {
            vals[i] = unq_color(EP_RANGES[ep_rng], ep_d[off + i],
                                ep_m[off + i]);
        }
        off += per_sub;
        if (!decode_cem(cems[s], vals, e0s[s], e1s[s])) {
            set_err("ASTC: unimplemented endpoint mode");
            return false;
        }
    }
    bool small = bw * bh < 31;
    for (int y = 0; y < bh; y++) {
        for (int x = 0; x < bw; x++) {
            int sub = (part_count > 1)
                ? select_partition(seed, x, y, part_count, small) : 0;
            const RGBA& e0 = e0s[sub];
            const RGBA& e1 = e1s[sub];
            int w0 = grid0[y * bw + x];
            int px[4] = {
                interp_ch(e0.r, e1.r, w0, srgb),
                interp_ch(e0.g, e1.g, w0, srgb),
                interp_ch(e0.b, e1.b, w0, srgb),
                interp_ch(e0.a, e1.a, w0, false),
            };
            if (dual) {
                int w1 = grid1[y * bw + x];
                int c0 = (ccs == 0) ? e0.r : (ccs == 1) ? e0.g
                       : (ccs == 2) ? e0.b : e0.a;
                int c1 = (ccs == 0) ? e1.r : (ccs == 1) ? e1.g
                       : (ccs == 2) ? e1.b : e1.a;
                px[ccs] = interp_ch(c0, c1, w1, srgb && ccs < 3);
            }
            uint8_t* o = out + (y * bw + x) * 4;
            o[0] = (uint8_t)px[0];
            o[1] = (uint8_t)px[1];
            o[2] = (uint8_t)px[2];
            o[3] = (uint8_t)px[3];
        }
    }
    return true;
}

}  // namespace

extern "C" {

const char* mrt_astc_error() { return g_err; }

// Decode a tightly-packed ASTC LDR payload into RGBA8 [height, width, 4].
// Returns 0 on success, nonzero on failure (message via mrt_astc_error).
int mrt_astc_decode(const uint8_t* payload, size_t payload_len,
                    int width, int height, int block_w, int block_h,
                    int srgb, uint8_t* out) {
    if (width <= 0 || height <= 0 || block_w < 4 || block_w > 12 ||
        block_h < 4 || block_h > 12) {
        set_err("ASTC: bad dimensions");
        return 1;
    }
    long bx = (width + block_w - 1) / block_w;
    long by = (height + block_h - 1) / block_h;
    if ((unsigned long)(bx * by) * 16ul > payload_len) {
        set_err("ASTC: payload truncated");
        return 1;
    }
    uint8_t tmp[12 * 12 * 4];
    for (long b = 0; b < bx * by; b++) {
        long yb = b / bx, xb = b % bx;
        if (!decode_block(payload + b * 16, block_w, block_h, srgb != 0,
                          tmp)) {
            char msg[300];
            std::snprintf(msg, sizeof(msg), "block %ld: %s", b, g_err);
            set_err(msg);
            return 1;
        }
        for (int y = 0; y < block_h; y++) {
            long iy = yb * block_h + y;
            if (iy >= height) break;
            long ix0 = xb * block_w;
            int copy_w = block_w;
            if (ix0 + copy_w > width) copy_w = (int)(width - ix0);
            std::memcpy(out + (iy * width + ix0) * 4,
                        tmp + y * block_w * 4, copy_w * 4);
        }
    }
    return 0;
}

}  // extern "C"
