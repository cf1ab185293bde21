"""ASTC LDR block-decode machinery (spec-derived, pure Python/numpy).

Role in the pipeline: the reference accepts any KTX2 file libktx can
transcode, *including UASTC* (``/root/reference/src/mgr.cpp:199-212``
feeds every ``.ktx2`` through ``ktx::loadKTXMem``). UASTC LDR blocks
are a constrained subset of ASTC 4x4 blocks, so UASTC support
(VERDICT r3 #2) is built in two layers:

 - this module: the ASTC LDR decode *machinery* — bounded integer
   sequence encoding (trits/quints), endpoint/weight unquantization,
   the partition hash, LDR color-endpoint modes, and the weight
   interpolation rule. All of it is pinned by the published Khronos
   Data Format Specification / ISO ASTC text.
 - ``assets/uastc.py``: the UASTC block layout that drives it.

Provenance (zero-egress sandbox — same posture as native/etc1s.cpp):
written from the ASTC section of the Khronos Data Format Specification
(the ISO-published LDR profile), from memory, with every arbitrary
constant verified against invariants the spec *guarantees* by
construction (tests/test_astc_core.py):

 - trit packing: the 8-bit packed field decodes onto exactly the
   3^5 = 243 canonical trit 5-tuples (a near-bijection: 256 inputs,
   243 outputs);
 - quint packing: 7 bits → exactly 5^3 = 125 quint triples;
 - endpoint unquantization, every range: exactly `levels` distinct
   values, min 0, max 255, and complement symmetry
   unq(~v) == 255 - unq(v);
 - weight unquantization, every range: distinct, 0..64, complement
   symmetry unq(~v) == 64 - unq(v).

These invariants are tight enough that a misremembered swizzle or
multiplier fails loudly in CI; they are the strongest verification
available without network access or a second decoder. Structures the
invariants cannot pin (e.g. the partition-hash constants) are marked
at their definition and exercised by determinism/range tests only.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# ---------------------------------------------------------------------------
# Bit reader (LSB-first, as ASTC/UASTC transmit fields)


class BitReader:
    """LSB-first bit reader over a bytes-like block."""

    def __init__(self, data: bytes):
        self._v = int.from_bytes(bytes(data), "little")
        self._n = 8 * len(data)
        self.pos = 0

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self._n:
            raise ValueError(
                f"ASTC bitstream overrun: need {nbits} bits at {self.pos} "
                f"of {self._n}"
            )
        out = (self._v >> self.pos) & ((1 << nbits) - 1)
        self.pos += nbits
        return out

    def remaining(self) -> int:
        return self._n - self.pos


# ---------------------------------------------------------------------------
# Trit / quint block decode (spec pseudo-code, verified by the 243/125
# image-cardinality invariant in tests/test_astc_core.py)


def _decode_trit_block(T: int) -> tuple[int, int, int, int, int]:
    """8 packed bits -> 5 trits, per the spec's decode procedure."""

    def bits(v, lo, hi):  # inclusive bit range
        return (v >> lo) & ((1 << (hi - lo + 1)) - 1)

    if bits(T, 2, 4) == 0b111:
        C = (bits(T, 5, 7) << 2) | bits(T, 0, 1)
        t4 = t3 = 2
    else:
        C = bits(T, 0, 4)
        if bits(T, 5, 6) == 0b11:
            t4 = 2
            t3 = bits(T, 7, 7)
        else:
            t4 = bits(T, 7, 7)
            t3 = bits(T, 5, 6)
    if bits(C, 0, 1) == 0b11:
        t2 = 2
        t1 = bits(C, 4, 4)
        t0 = (bits(C, 3, 3) << 1) | (bits(C, 2, 2) & ~bits(C, 3, 3) & 1)
    elif bits(C, 2, 3) == 0b11:
        t2 = 2
        t1 = 2
        t0 = bits(C, 0, 1)
    else:
        t2 = bits(C, 4, 4)
        t1 = bits(C, 2, 3)
        t0 = bits(C, 0, 1)
    return (t0, t1, t2, t3, t4)


def _decode_quint_block(Q: int) -> tuple[int, int, int]:
    """7 packed bits -> 3 quints, per the spec's decode procedure."""

    def bits(v, lo, hi):
        return (v >> lo) & ((1 << (hi - lo + 1)) - 1)

    if bits(Q, 1, 2) == 0b11 and bits(Q, 5, 6) == 0b00:
        q2 = (
            (bits(Q, 0, 0) << 2)
            | ((bits(Q, 4, 4) & ~bits(Q, 0, 0) & 1) << 1)
            | (bits(Q, 3, 3) & ~bits(Q, 0, 0) & 1)
        )
        q1 = 4
        q0 = 4
    else:
        if bits(Q, 1, 2) == 0b11:
            q2 = 4
            C = (bits(Q, 3, 4) << 3) | ((~bits(Q, 5, 6) & 0b11) << 1) | bits(Q, 0, 0)
        else:
            q2 = bits(Q, 5, 6)
            C = bits(Q, 0, 4)
        if bits(C, 0, 2) == 0b101:
            q1 = 4
            q0 = bits(C, 3, 4)
        else:
            q1 = bits(C, 3, 4)
            q0 = bits(C, 0, 2)
    return (q0, q1, q2)


TRIT_TABLE = [_decode_trit_block(t) for t in range(256)]
QUINT_TABLE = [_decode_quint_block(q) for q in range(128)]

# Canonical encode directions, derived purely by inverting the decode
# tables (first preimage wins) — no independently-remembered encode
# pseudo-code is involved, so encoder and decoder cannot disagree.
TRIT_ENCODE: dict[tuple[int, ...], int] = {}
for _t in range(255, -1, -1):
    TRIT_ENCODE[TRIT_TABLE[_t]] = _t
QUINT_ENCODE: dict[tuple[int, ...], int] = {}
for _q in range(127, -1, -1):
    QUINT_ENCODE[QUINT_TABLE[_q]] = _q


# ---------------------------------------------------------------------------
# Quantization ranges

# range index -> (levels, bits, trits?, quints?) for color endpoints.
# levels = 2^bits * 3^trits * 5^quints; the level counts are the spec's
# table and are re-derivable from the factorization, so this table is
# structurally safe.
_EP_RANGES = [
    (2, 1, 0, 0), (3, 0, 1, 0), (4, 2, 0, 0), (5, 0, 0, 1),
    (6, 1, 1, 0), (8, 3, 0, 0), (10, 1, 0, 1), (12, 2, 1, 0),
    (16, 4, 0, 0), (20, 2, 0, 1), (24, 3, 1, 0), (32, 5, 0, 0),
    (40, 3, 0, 1), (48, 4, 1, 0), (64, 6, 0, 0), (80, 4, 0, 1),
    (96, 5, 1, 0), (128, 7, 0, 0), (160, 5, 0, 1), (192, 6, 1, 0),
    (256, 8, 0, 0),
]
# Weight ranges (0..11).
_WT_RANGES = [
    (2, 1, 0, 0), (3, 0, 1, 0), (4, 2, 0, 0), (5, 0, 0, 1),
    (6, 1, 1, 0), (8, 3, 0, 0), (10, 1, 0, 1), (12, 2, 1, 0),
    (16, 4, 0, 0), (20, 2, 0, 1), (24, 3, 1, 0), (32, 5, 0, 0),
]


def ep_levels(rng: int) -> int:
    return _EP_RANGES[rng][0]


def wt_levels(rng: int) -> int:
    return _WT_RANGES[rng][0]


# ---------------------------------------------------------------------------
# ISE (integer sequence) decode: a sequence of `count` values in a given
# range, packed LSB-first. Trit groups of 5 interleave value bits with
# the 8 packed trit bits split (2,2,1,2,1); quint groups of 3 split the
# 7 packed bits (3,2,2). Trailing partial groups store only the bits
# needed; missing bits read as zero (the spec pads with zeros).

_TRIT_SPLITS = (2, 2, 1, 2, 1)
_QUINT_SPLITS = (3, 2, 2)


def ise_sequence_bits(count: int, levels_cfg: tuple[int, int, int, int]) -> int:
    """Exact bit count of an ISE sequence (spec formula)."""
    _, b, t, q = levels_cfg
    if t:
        return (8 * count + 4) // 5 + count * b
    if q:
        return (7 * count + 2) // 3 + count * b
    return count * b


def _ise_decode(reader: BitReader, count: int,
                cfg: tuple[int, int, int, int]) -> list[tuple[int, int]]:
    """Decode `count` ISE values -> list of (digit, bits) pairs.

    `digit` is the trit/quint (0 when the range is plain bits); `bits`
    is the n-bit LSB part. Reads exactly ise_sequence_bits() bits.
    """
    _, nbits, trits, quints = cfg
    if not trits and not quints:
        return [(0, reader.read(nbits)) for _ in range(count)]
    group = 5 if trits else 3
    splits = _TRIT_SPLITS if trits else _QUINT_SPLITS
    table = TRIT_TABLE if trits else QUINT_TABLE
    out: list[tuple[int, int]] = []
    i = 0
    while i < count:
        g = min(group, count - i)
        # A partial trailing group stores exactly cumsum(splits[:g])
        # packed bits — the spec's per-count bit total truncates after
        # the last transmitted value's split, and the missing high
        # packed bits decode as zero (zero-padding semantics).
        ms: list[int] = []
        packed = 0
        pb = 0
        for j in range(g):
            ms.append(reader.read(nbits))
            packed |= reader.read(splits[j]) << pb
            pb += splits[j]
        digits = table[packed]
        out.extend((digits[j], ms[j]) for j in range(g))
        i += g
    return out


def _ise_encode(pairs: list[tuple[int, int]],
                cfg: tuple[int, int, int, int]) -> tuple[int, int]:
    """Encode (digit, bits) pairs into an ISE stream (LSB-first int).

    Inverse of _ise_decode (round-trip pinned in tests). Partial
    trailing groups pick a packed value whose truncated low bits decode
    to the transmitted digits under zero-padding.
    """
    _, nbits, trits, quints = cfg
    if not trits and not quints:
        stream = 0
        for i, (_, m) in enumerate(pairs):
            stream |= (m & ((1 << nbits) - 1)) << (i * nbits)
        return stream, nbits * len(pairs)
    group = 5 if trits else 3
    splits = _TRIT_SPLITS if trits else _QUINT_SPLITS
    table = TRIT_TABLE if trits else QUINT_TABLE
    stream = 0
    pos = 0
    i = 0
    while i < len(pairs):
        g = min(group, len(pairs) - i)
        digits = tuple(d for (d, _) in pairs[i:i + g])
        cumbits = sum(splits[:g])
        packed = None
        for cand in range(1 << cumbits):
            if table[cand][:g] == digits:
                packed = cand
                break
        if packed is None:  # unreachable for canonical digit values
            raise ValueError(f"no ISE packing for digits {digits}")
        pb = 0
        for j in range(g):
            stream |= pairs[i + j][1] << pos
            pos += nbits
            stream |= ((packed >> pb) & ((1 << splits[j]) - 1)) << pos
            pos += splits[j]
            pb += splits[j]
        i += g
    return stream, pos


def quantize_color(rng: int, value: int) -> tuple[int, int]:
    """Nearest (digit, bits) pair representing `value` in a color range."""
    best = min(color_levels(rng), key=lambda t: abs(t[0] - value))
    return best[1], best[2]


def quantize_weight(rng: int, w64: int) -> tuple[int, int]:
    """Nearest (digit, bits) pair representing a 0..64 weight."""
    best = min(weight_levels(rng), key=lambda t: abs(t[0] - w64))
    return best[1], best[2]


# ---------------------------------------------------------------------------
# Unquantization. Spec construction: A = 9 (or 7) replicas of the LSB of
# the bit part; B = a per-range swizzle of the bit part; C = a per-range
# multiplier for the trit/quint digit; then
#   val = digit*C + B;  val ^= A;  val = (A & 0x80) | (val >> 2)   (color)
#   val = digit*C + B;  val ^= A;  val = (A & 0x20) | (val >> 2)   (weight)
# and weights > 32 get +1 so the top of the range is exactly 64.
# The B swizzles below are written as functions of the bit part; the
# invariant tests pin them (distinctness + 0/255 endpoints + complement
# symmetry would all break under a wrong swizzle).


def _bit(v: int, i: int) -> int:
    return (v >> i) & 1


def _color_unquant_tq(digit: int, m: int, nbits: int, trits: bool) -> int:
    if nbits == 0:
        # 3- and 5-level quantization exists only for weights in ASTC;
        # color endpoints start at 6 levels (spec color quant table).
        raise NotImplementedError(
            "ASTC color endpoints have no 0-bit trit/quint ranges"
        )
    a = _bit(m, 0)
    A = 0x1FF if a else 0
    if trits:
        if nbits == 1:
            B, C = 0, 204
        elif nbits == 2:
            b = _bit(m, 1)
            B = (b << 8) | (b << 4) | (b << 2) | (b << 1)
            C = 93
        elif nbits == 3:
            b, c = _bit(m, 1), _bit(m, 2)
            B = (c << 8) | (b << 7) | (c << 3) | (b << 2) | (c << 1) | b
            C = 44
        elif nbits == 4:
            b, c, d = _bit(m, 1), _bit(m, 2), _bit(m, 3)
            B = (d << 8) | (c << 7) | (b << 6) | (d << 2) | (c << 1) | b
            C = 22
        elif nbits == 5:
            b, c, d, e = _bit(m, 1), _bit(m, 2), _bit(m, 3), _bit(m, 4)
            B = (e << 8) | (d << 7) | (c << 6) | (b << 5) | (e << 1) | d
            C = 11
        elif nbits == 6:
            b, c, d, e, f = (_bit(m, 1), _bit(m, 2), _bit(m, 3),
                             _bit(m, 4), _bit(m, 5))
            B = (f << 8) | (e << 7) | (d << 6) | (c << 5) | (b << 4) | f
            C = 5
        else:
            raise ValueError(f"trit color range with {nbits} bits")
    else:
        if nbits == 1:
            B, C = 0, 113
        elif nbits == 2:
            b = _bit(m, 1)
            B = (b << 8) | (b << 3) | (b << 2)
            C = 54
        elif nbits == 3:
            b, c = _bit(m, 1), _bit(m, 2)
            B = (c << 8) | (b << 7) | (c << 2) | (b << 1) | c
            C = 26
        elif nbits == 4:
            b, c, d = _bit(m, 1), _bit(m, 2), _bit(m, 3)
            B = (d << 8) | (c << 7) | (b << 6) | (d << 1) | c
            C = 13
        elif nbits == 5:
            b, c, d, e = _bit(m, 1), _bit(m, 2), _bit(m, 3), _bit(m, 4)
            B = (e << 8) | (d << 7) | (c << 6) | (b << 5) | e
            C = 6
        else:
            raise ValueError(f"quint color range with {nbits} bits")
    v = digit * C + B
    v ^= A
    return (A & 0x80) | (v >> 2)


def unquant_color(rng: int, digit: int, m: int) -> int:
    """Unquantize one color-endpoint ISE value to 0..255."""
    _, nbits, trits, quints = _EP_RANGES[rng]
    if not trits and not quints:
        # plain bits: replicate to 8 bits
        if nbits == 0:
            return 0
        v = m
        out = 0
        shift = 8 - nbits
        while shift > -nbits:
            out |= (v << shift) if shift >= 0 else (v >> -shift)
            shift -= nbits
        return out & 0xFF
    return _color_unquant_tq(digit, m, nbits, bool(trits))


def _weight_unquant_tq(digit: int, m: int, nbits: int, trits: bool) -> int:
    if nbits == 0:
        # spec: 3-level weights are d*32, 5-level weights are d*16
        return digit * (32 if trits else 16)
    a = _bit(m, 0)
    A = 0x7F if a else 0
    if trits:
        if nbits == 1:
            B, C = 0, 50
        elif nbits == 2:
            b = _bit(m, 1)
            B = (b << 6) | (b << 2) | b
            C = 23
        elif nbits == 3:
            # spec swizzle for 3-bit trit weights: B = cb000cb
            b, c = _bit(m, 1), _bit(m, 2)
            B = (c << 6) | (b << 5) | (c << 1) | b
            C = 11
        else:
            raise ValueError(f"trit weight range with {nbits} bits")
    else:
        if nbits == 1:
            B, C = 0, 28
        elif nbits == 2:
            b = _bit(m, 1)
            B = (b << 6) | (b << 1)
            C = 13
        else:
            raise ValueError(f"quint weight range with {nbits} bits")
    v = digit * C + B
    v ^= A
    v = (A & 0x20) | (v >> 2)
    return v + 1 if v > 32 else v


def unquant_weight(rng: int, digit: int, m: int) -> int:
    """Unquantize one weight ISE value to 0..64."""
    _, nbits, trits, quints = _WT_RANGES[rng]
    if not trits and not quints:
        # bit replication to 6 bits, then the >32 correction
        v = m
        out = 0
        shift = 6 - nbits
        while shift > -nbits:
            out |= (v << shift) if shift >= 0 else (v >> -shift)
            shift -= nbits
        out &= 0x3F
        return out + 1 if out > 32 else out
    return _weight_unquant_tq(digit, m, nbits, bool(trits))


# Precomputed (value -> list of (digit, m) in increasing unquantized
# order) per range — used by the fixture encoder for nearest-level
# quantization, and by tests.
def color_levels(rng: int) -> list[tuple[int, int, int]]:
    """All (unquantized, digit, m) for a color range, sorted by value."""
    levels, nbits, trits, quints = _EP_RANGES[rng]
    digits = 3 if trits else (5 if quints else 1)
    out = []
    for d in range(digits):
        for m in range(1 << nbits):
            out.append((unquant_color(rng, d, m), d, m))
    out.sort()
    return out


def weight_levels(rng: int) -> list[tuple[int, int, int]]:
    levels, nbits, trits, quints = _WT_RANGES[rng]
    digits = 3 if trits else (5 if quints else 1)
    out = []
    for d in range(digits):
        for m in range(1 << nbits):
            out.append((unquant_weight(rng, d, m), d, m))
    out.sort()
    return out


# ---------------------------------------------------------------------------
# Partition selection (the hash52-based function from the spec).
# The hash constants cannot be pinned by an invariant; they are marked
# best-effort spec recall and exercised by determinism/range tests.
# UASTC's multi-subset modes additionally need the UASTC pattern-index
# -> ASTC seed tables, which are NOT reconstructable from spec text —
# those modes gate loudly in assets/uastc.py instead of guessing.


def _hash52(p: int) -> int:
    M = 0xFFFFFFFF
    p &= M
    p ^= p >> 15
    p = (p - (p << 17)) & M
    p = (p + (p << 7)) & M
    p = (p + (p << 4)) & M
    p ^= p >> 5
    p = (p + (p << 16)) & M
    p ^= p >> 7
    p ^= p >> 3
    p ^= (p << 6) & M
    p ^= p >> 17
    return p & M


def select_partition(seed: int, x: int, y: int, partition_count: int,
                     small_block: bool = True) -> int:
    """ASTC partition index for texel (x, y) (z = 0), LDR 2D."""
    if partition_count == 1:
        return 0
    if small_block:
        x <<= 1
        y <<= 1
    z = 0
    seed += (partition_count - 1) * 1024
    rnum = _hash52(seed)
    seeds = [(rnum >> s) & 0xF for s in (0, 4, 8, 12, 16, 20, 24, 28)]
    seed9 = (rnum >> 18) & 0xF
    seed10 = (rnum >> 22) & 0xF
    seed11 = (rnum >> 26) & 0xF
    seed12 = ((rnum >> 30) | (rnum << 2)) & 0xF
    sq = [s * s for s in seeds]
    seed9, seed10, seed11, seed12 = (seed9 * seed9, seed10 * seed10,
                                     seed11 * seed11, seed12 * seed12)
    if seed & 1:
        sh1 = 4 if seed & 2 else 5
        sh2 = 6 if partition_count == 3 else 5
    else:
        sh1 = 6 if partition_count == 3 else 5
        sh2 = 4 if seed & 2 else 5
    sh3 = sh1 if seed & 0x10 else sh2
    s1, s2, s3, s4, s5, s6, s7, s8 = (
        sq[0] >> sh1, sq[1] >> sh2, sq[2] >> sh1, sq[3] >> sh2,
        sq[4] >> sh1, sq[5] >> sh2, sq[6] >> sh1, sq[7] >> sh2,
    )
    s9, s10, s11, s12 = (seed9 >> sh3, seed10 >> sh3,
                         seed11 >> sh3, seed12 >> sh3)
    # Plane equations per the spec: x/y coefficients come in seed pairs
    # (s1,s2)/(s3,s4)/(s5,s6)/(s7,s8); s9-s12 are z-only (cross-assigned
    # 11/12/9/10), inert here with z = 0.
    a = (s1 * x + s2 * y + s11 * z + (rnum >> 14)) & 0x3F
    b = (s3 * x + s4 * y + s12 * z + (rnum >> 10)) & 0x3F
    c = (s5 * x + s6 * y + s9 * z + (rnum >> 6)) & 0x3F
    d = (s7 * x + s8 * y + s10 * z + (rnum >> 2)) & 0x3F
    if partition_count <= 3:
        d = 0
    if partition_count <= 2:
        c = 0
    if a >= b and a >= c and a >= d:
        return 0
    if b >= c and b >= d:
        return 1
    if c >= d:
        return 2
    return 3


# ---------------------------------------------------------------------------
# LDR color endpoint modes (CEMs). Only the LDR direct/base+offset modes
# the UASTC subset can produce are implemented; others raise.


def _clamp8(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _blue_contract(r: int, g: int, b: int, a: int) -> tuple[int, int, int, int]:
    return ((r + b) >> 1, (g + b) >> 1, b, a)


def _bit_transfer_signed(a: int, b: int) -> tuple[int, int]:
    """spec bit_transfer_signed: a -> signed 6-bit offset, b gains a's MSB."""
    b = (b >> 1) | (a & 0x80)
    a = (a >> 1) & 0x3F
    if a & 0x20:
        a -= 0x40
    return a, b


def decode_cem_ldr(cem: int, v: list[int]) -> tuple[tuple[int, int, int, int],
                                                    tuple[int, int, int, int]]:
    """Decode unquantized endpoint values -> (e0, e1) RGBA8 endpoints."""
    def _clamp(e):
        return tuple(min(255, max(0, c)) for c in e)

    if cem == 0:  # luminance, direct
        return (v[0], v[0], v[0], 255), (v[1], v[1], v[1], 255)
    if cem == 1:  # luminance, base+offset
        l0 = (v[0] >> 2) | (v[1] & 0xC0)
        l1 = min(l0 + (v[1] & 0x3F), 0xFF)
        return (l0, l0, l0, 255), (l1, l1, l1, 255)
    if cem == 4:  # luminance + alpha, direct
        return (v[0], v[0], v[0], v[2]), (v[1], v[1], v[1], v[3])
    if cem == 5:  # luminance + alpha, base+offset
        d_l, b_l = _bit_transfer_signed(v[1], v[0])
        d_a, b_a = _bit_transfer_signed(v[3], v[2])
        e0 = (b_l, b_l, b_l, b_a)
        e1 = (b_l + d_l, b_l + d_l, b_l + d_l, b_a + d_a)
        return _clamp(e0), _clamp(e1)
    if cem == 9 or cem == 13:  # RGB(A), base+offset
        d_r, b_r = _bit_transfer_signed(v[1], v[0])
        d_g, b_g = _bit_transfer_signed(v[3], v[2])
        d_b, b_b = _bit_transfer_signed(v[5], v[4])
        if cem == 13:
            d_a, b_a = _bit_transfer_signed(v[7], v[6])
        else:
            d_a, b_a = 0, 255
        if d_r + d_g + d_b >= 0:
            e0 = (b_r, b_g, b_b, b_a)
            e1 = (b_r + d_r, b_g + d_g, b_b + d_b, b_a + d_a)
        else:
            e0 = _blue_contract(b_r + d_r, b_g + d_g, b_b + d_b, b_a + d_a)
            e1 = _blue_contract(b_r, b_g, b_b, b_a)
        return _clamp(e0), _clamp(e1)
    if cem == 6:  # RGB scale
        e1 = (v[0], v[1], v[2], 255)
        e0 = ((v[0] * v[3]) >> 8, (v[1] * v[3]) >> 8, (v[2] * v[3]) >> 8, 255)
        return e0, e1
    if cem == 8 or cem == 12:  # RGB(A) direct
        s0 = v[0] + v[2] + v[4]
        s1 = v[1] + v[3] + v[5]
        a0, a1 = (v[6], v[7]) if cem == 12 else (255, 255)
        if s1 >= s0:
            return (v[0], v[2], v[4], a0), (v[1], v[3], v[5], a1)
        return (_blue_contract(v[1], v[3], v[5], a1),
                _blue_contract(v[0], v[2], v[4], a0))
    if cem == 10:  # RGB scale + two alphas
        e1 = (v[0], v[1], v[2], v[5])
        e0 = ((v[0] * v[3]) >> 8, (v[1] * v[3]) >> 8, (v[2] * v[3]) >> 8, v[4])
        return e0, e1
    raise NotImplementedError(
        f"ASTC CEM {cem} is outside the implemented LDR subset "
        "(0, 1, 4, 5, 6, 8, 9, 10, 12, 13 — the HDR modes 2/3/7/11/14/15 "
        "are out of LDR-profile scope)"
    )


def interpolate_unorm8(e0: tuple[int, ...], e1: tuple[int, ...],
                       w: int, srgb: bool = False) -> tuple[int, int, int, int]:
    """decode_unorm8 interpolation of two RGBA8 endpoints at weight w/64."""
    out = []
    for ch in range(4):
        c0, c1 = e0[ch], e1[ch]
        if srgb and ch < 3:
            C0 = (c0 << 8) | 0x80
            C1 = (c1 << 8) | 0x80
        else:
            C0 = (c0 << 8) | c0
            C1 = (c1 << 8) | c1
        out.append(((C0 * (64 - w) + C1 * w + 32) >> 6) >> 8)
    return tuple(out)  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Block assembly: decode a 4x4 LDR block from explicit parameters
# (UASTC synthesizes these; a standard-ASTC header parser could too).


@dataclasses.dataclass(frozen=True)
class ASTCBlockParams:
    """Fully-resolved parameters of one 4x4 LDR block."""

    cem: int
    endpoint_range: int
    weight_range: int
    # raw ISE (digit, m) pairs, per subset, in spec order (v0, v1, ...)
    endpoints: tuple[tuple[tuple[int, int], ...], ...]
    # 16 (or 32, dual-plane) raw weight ISE pairs, texel-major; for
    # dual-plane, plane-0/plane-1 weights alternate (w0 p0, w0 p1, ...)
    weights: tuple[tuple[int, int], ...]
    dual_plane: bool = False
    ccs: int = 0  # color component the second plane drives
    partition_count: int = 1
    partition_seed: int = 0
    srgb: bool = False


def _infill_weights(grid: list[list[int]], gw: int, gh: int,
                    bw: int, bh: int) -> list[list[int]]:
    """Spec weight-grid infill (bilinear decimation inverse) to block dims.

    Identity when the grid already matches the block dims (pinned by
    tests/test_astc_core.py::test_infill_identity).
    """
    if gw == bw and gh == bh:
        return grid
    ds = (1024 + bw // 2) // (bw - 1)
    dt = (1024 + bh // 2) // (bh - 1)
    out = [[0] * bw for _ in range(bh)]
    for t in range(bh):
        for s in range(bw):
            gs = (ds * s * (gw - 1) + 32) >> 6
            gt = (dt * t * (gh - 1) + 32) >> 6
            js, fs = gs >> 4, gs & 0xF
            jt, ft = gt >> 4, gt & 0xF
            w11 = (fs * ft + 8) >> 4
            w10 = ft - w11
            w01 = fs - w11
            w00 = 16 - fs - ft + w11

            def g(y, x):
                if y >= gh or x >= gw:
                    return 0  # zero-weight taps only (fs/ft == 0 there)
                return grid[y][x]

            out[t][s] = (g(jt, js) * w00 + g(jt, js + 1) * w01 +
                         g(jt + 1, js) * w10 + g(jt + 1, js + 1) * w11 + 8) >> 4
    return out


def _decode_block_mode_2d(bm: int) -> tuple[int, int, int, bool, bool]:
    """Decode the 11-bit 2D block-mode field.

    Returns (grid_w, grid_h, weight_range, dual_plane, high_prec_raises).
    Mirrors the spec's 2D block-mode layout table. Reserved encodings
    raise ValueError (the spec maps them to the error color; an asset
    pipeline wants the loud failure instead).
    """
    base_quant = (bm >> 4) & 1
    H = (bm >> 9) & 1
    D = (bm >> 10) & 1
    A = (bm >> 5) & 0x3
    if bm & 3:
        base_quant |= (bm & 3) << 1
        B = (bm >> 7) & 3
        sel = (bm >> 2) & 3
        if sel == 0:
            gw, gh = B + 4, A + 2
        elif sel == 1:
            gw, gh = B + 8, A + 2
        elif sel == 2:
            gw, gh = A + 2, B + 8
        else:
            B &= 1
            if bm & 0x100:
                gw, gh = B + 2, A + 2
            else:
                gw, gh = A + 2, B + 6
    else:
        base_quant |= ((bm >> 2) & 3) << 1
        if ((bm >> 2) & 3) == 0:
            raise ValueError("ASTC: reserved block mode")
        B = (bm >> 9) & 3
        sel = (bm >> 7) & 3
        if sel == 0:
            gw, gh = 12, A + 2
        elif sel == 1:
            gw, gh = A + 2, 12
        elif sel == 2:
            gw, gh = A + 6, B + 6
            D = 0
            H = 0
        else:
            # 6x10/10x6 rows: bits 10/9 still carry D/H (only the
            # (A+6)x(B+6) row above repurposes them for B).
            sub = (bm >> 5) & 3
            if sub == 0:
                gw, gh = 6, 10
            elif sub == 1:
                gw, gh = 10, 6
            else:
                raise ValueError("ASTC: reserved block mode")
    # base_quant is a 3-bit value >= 2; with H it selects the weight range
    if base_quant < 2:
        raise ValueError("ASTC: reserved weight range in block mode")
    weight_range = (base_quant - 2) + 6 * H
    return gw, gh, weight_range, bool(D), False


_VOID_EXTENT_2D = 0x1FC  # bits [8:0]


def decode_astc_block(data: bytes, block_w: int = 4, block_h: int = 4,
                      srgb: bool = False) -> np.ndarray:
    """Decode one standard ASTC LDR 2D block -> [block_h, block_w, 4] u8.

    Covers the full LDR profile: every LDR CEM (direct + base-offset),
    shared and mixed per-partition CEMs (the spec C.2.11 encoded-type
    split across the CEM field and the bits below the weight data),
    dual-plane, 1-4 partitions, decimated weight grids. HDR features
    (HDR CEMs 2/3/7/11/14/15, HDR void-extent) raise NotImplementedError
    — every such feature is explicit in the block header, so unsupported
    inputs fail loudly, never silently.
    """
    if len(data) != 16:
        raise ValueError("ASTC block must be 16 bytes")
    v = int.from_bytes(data, "little")
    bm = v & 0x7FF
    if (bm & 0x1FF) == _VOID_EXTENT_2D:
        if (v >> 9) & 1:  # bit 9 = dynamic-range flag
            raise NotImplementedError("ASTC: HDR void-extent block")
        rgba16 = [(v >> (64 + 16 * c)) & 0xFFFF for c in range(4)]
        px = np.array([c >> 8 for c in rgba16], np.uint8)
        return np.broadcast_to(px, (block_h, block_w, 4)).copy()

    gw, gh, wrng, dual, _ = _decode_block_mode_2d(bm)
    if gw > block_w or gh > block_h:
        raise ValueError("ASTC: weight grid exceeds block footprint")
    part_count = ((v >> 11) & 3) + 1
    if dual and part_count == 4:
        raise ValueError("ASTC: dual plane with 4 partitions is illegal")

    n_weights = gw * gh * (2 if dual else 1)
    if n_weights > 64:
        raise ValueError(f"ASTC: {n_weights} weights exceeds the 64 cap")
    wcfg = _WT_RANGES[wrng]
    wbits = ise_sequence_bits(n_weights, wcfg)
    if not 24 <= wbits <= 96:
        raise ValueError(f"ASTC: weight stream of {wbits} bits is illegal")
    below_weights = 128 - wbits

    seed = 0
    if part_count == 1:
        cems = [(v >> 13) & 0xF]
        ep_start = 17
    else:
        seed = (v >> 13) & 0x3FF
        cem_sel = (v >> 23) & 0x3F
        ep_start = 29
        if (cem_sel & 3) == 0:
            # All partitions share one CEM (the 4 high field bits).
            cems = [cem_sel >> 2] * part_count
        else:
            # Mixed per-partition CEMs (spec C.2.11): the encoded-type
            # sequence is 2 selector bits, then one class bit per
            # partition, then 2 mode-low bits per partition — its first
            # 6 bits are the CEM field, the remaining (3·P − 4) bits sit
            # DIRECTLY BELOW the weight data (above the CCS when
            # dual-plane). Partition i's CEM class = (selector − 1) +
            # class_bit_i; CEM = class·4 + mode_low_i.
            highpart = 3 * part_count - 4
            below_weights -= highpart
            high = (v >> below_weights) & ((1 << highpart) - 1)
            enc = cem_sel | (high << 6)
            base = (enc & 3) - 1
            bitpos = 2
            cems = []
            for _ in range(part_count):
                cems.append((base + ((enc >> bitpos) & 1)) << 2)
                bitpos += 1
            for i in range(part_count):
                cems[i] |= (enc >> bitpos) & 3
                bitpos += 2
    for c in cems:
        if c in (2, 3, 7, 11, 14, 15):
            raise NotImplementedError(f"ASTC: HDR endpoint mode {c}")

    ccs = 0
    extra = 2 if dual else 0
    if extra:
        ccs = (v >> (below_weights - extra)) & 3
    # endpoint values: per subset, 2*(class+1) integers; one ISE stream
    n_ep_vals = sum(2 * ((c >> 2) + 1) for c in cems)
    if n_ep_vals > 18:
        raise ValueError(
            f"ASTC: {n_ep_vals} endpoint values exceeds the 18-value cap"
        )
    avail = below_weights - extra - ep_start
    if avail < 0:
        raise ValueError("ASTC: endpoint field overruns the weight data")
    # The endpoint range is implicit: the largest range (>= 6 levels)
    # whose ISE stream fits in the bits between the header and the
    # weight/extra data (spec rule).
    ep_rng = None
    for rng_i in range(20, 3, -1):
        if ise_sequence_bits(n_ep_vals, _EP_RANGES[rng_i]) <= avail:
            ep_rng = rng_i
            break
    if ep_rng is None:
        raise ValueError("ASTC: no endpoint range fits the remaining bits")

    ep_reader = BitReader(data)
    ep_reader.pos = ep_start
    ep_vals = _ise_decode(ep_reader, n_ep_vals, _EP_RANGES[ep_rng])
    endpoints = []
    off = 0
    for c in cems:  # per-partition value counts differ under mixed CEMs
        per_sub = 2 * ((c >> 2) + 1)
        endpoints.append(tuple(ep_vals[off:off + per_sub]))
        off += per_sub

    # weights: the top bits of the block, bit-reversed
    rev = int(f"{v:0128b}"[::-1], 2)  # bit-reversed block, LSB-first now
    wreader = BitReader(rev.to_bytes(16, "little"))
    wvals = _ise_decode(wreader, n_weights, wcfg)

    # unquantize + infill
    if dual:
        p0 = [unquant_weight(wrng, d, m) for (d, m) in wvals[0::2]]
        p1 = [unquant_weight(wrng, d, m) for (d, m) in wvals[1::2]]
        grids = []
        for plane in (p0, p1):
            g = [[plane[t * gw + s] for s in range(gw)] for t in range(gh)]
            grids.append(_infill_weights(g, gw, gh, block_w, block_h))
    else:
        p0 = [unquant_weight(wrng, d, m) for (d, m) in wvals]
        g = [[p0[t * gw + s] for s in range(gw)] for t in range(gh)]
        grids = [_infill_weights(g, gw, gh, block_w, block_h)]

    eps = []
    for c, sub in zip(cems, endpoints):
        vals = [unquant_color(ep_rng, d, m) for (d, m) in sub]
        eps.append(decode_cem_ldr(c, vals))
    out = np.zeros((block_h, block_w, 4), np.uint8)
    small = block_w * block_h < 31
    for y in range(block_h):
        for x in range(block_w):
            sub = (select_partition(seed, x, y, part_count, small)
                   if part_count > 1 else 0)
            e0, e1 = eps[sub]
            if dual:
                px = list(interpolate_unorm8(e0, e1, grids[0][y][x], srgb))
                alt = interpolate_unorm8(e0, e1, grids[1][y][x], srgb)
                px[ccs] = alt[ccs]
            else:
                px = list(interpolate_unorm8(e0, e1, grids[0][y][x], srgb))
            out[y, x] = px
    return out


def decode_astc_image(payload: bytes, width: int, height: int,
                      block_w: int = 4, block_h: int = 4,
                      srgb: bool = False) -> np.ndarray:
    """Decode a tightly-packed ASTC LDR payload -> RGBA8 [H, W, 4]."""
    bx = (width + block_w - 1) // block_w
    by = (height + block_h - 1) // block_h
    need = bx * by * 16
    if len(payload) < need:
        raise ValueError(
            f"ASTC payload truncated: {len(payload)} bytes < {need} "
            f"({bx}x{by} blocks)"
        )
    out = np.zeros((by * block_h, bx * block_w, 4), np.uint8)
    for b in range(bx * by):
        yb, xb = divmod(b, bx)
        try:
            blk = decode_astc_block(
                payload[b * 16:(b + 1) * 16], block_w, block_h, srgb)
        except (ValueError, NotImplementedError) as e:
            raise type(e)(f"ASTC block {b} (x={xb}, y={yb}): {e}") from e
        out[yb * block_h:(yb + 1) * block_h,
            xb * block_w:(xb + 1) * block_w] = blk
    return out[:height, :width]


def encode_astc_block_2ep(pixels: np.ndarray, block_w: int = 4,
                          block_h: int = 4) -> bytes:
    """Fixture-grade standard-ASTC encoder for one block.

    Single-partition CEM 8 (opaque RGB) or CEM 12 (RGBA), full-footprint
    weight grid, 2-bit weights, 8-bit endpoints when they fit (4x4);
    min/max endpoints with texels projected on the endpoint axis. Real
    conformant ASTC — used to build KTX2 fixtures for tests/examples.
    """
    ph, pw = pixels.shape[:2]
    if (ph, pw) != (block_h, block_w):
        raise ValueError("pixel tile must match the block footprint")
    if block_w != 4 or block_h != 4:
        raise NotImplementedError("fixture encoder emits 4x4 blocks only")
    flat = pixels.reshape(16, 4).astype(np.int32)
    has_alpha = bool((flat[:, 3] != 255).any())
    cem = 12 if has_alpha else 8
    nch = 4 if has_alpha else 3
    # block mode 66: 4x4 grid, 2-bit plain weights (see tests)
    bm = 66
    v = bm | (cem << 13)
    # implicit endpoint range at 17-bit header, 32 weight bits:
    n_ep = 2 * ((cem >> 2) + 1)
    avail = 128 - 32 - 17
    ep_rng = None
    for rng_i in range(20, 3, -1):
        if ise_sequence_bits(n_ep, _EP_RANGES[rng_i]) <= avail:
            ep_rng = rng_i
            break
    assert ep_rng is not None
    lo = flat.min(axis=0)
    hi = flat.max(axis=0)
    lo_q = [quantize_color(ep_rng, int(c)) for c in lo[:nch]]
    hi_q = [quantize_color(ep_rng, int(c)) for c in hi[:nch]]
    lo_v = [unquant_color(ep_rng, d, m) for (d, m) in lo_q]
    hi_v = [unquant_color(ep_rng, d, m) for (d, m) in hi_q]
    if sum(hi_v[:3]) < sum(lo_v[:3]):  # keep s1 >= s0: no blue-contract
        lo_q, hi_q = hi_q, lo_q
        lo_v, hi_v = hi_v, lo_v
    pairs = []
    for c in range(nch):
        pairs += [lo_q[c], hi_q[c]]
    stream, nbits = _ise_encode(pairs, _EP_RANGES[ep_rng])
    v |= stream << 17
    axis = np.array(hi_v, np.float32) - np.array(lo_v, np.float32)
    denom = float(axis @ axis) or 1.0
    t = (flat[:, :nch].astype(np.float32) - np.array(lo_v, np.float32)) @ axis
    t64 = np.clip(t / denom * 64.0, 0, 64)
    uq = {0: 0, 1: 21, 2: 43, 3: 64}
    wsel = [min(uq, key=lambda k: abs(uq[k] - x)) for x in t64]
    wstream = 0
    for i, wv in enumerate(wsel):
        wstream |= wv << (2 * i)
    for i in range(32):
        if (wstream >> i) & 1:
            v |= 1 << (127 - i)
    return v.to_bytes(16, "little")


def encode_astc_image(img: np.ndarray) -> bytes:
    """Fixture-grade 4x4 standard-ASTC payload for an RGBA8 image."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    if h % 4 or w % 4:
        pad = np.zeros(((h + 3) // 4 * 4, (w + 3) // 4 * 4, 4), np.uint8)
        pad[:h, :w] = img
        img = pad
        h, w = img.shape[:2]
    out = bytearray()
    for by in range(h // 4):
        for bx in range(w // 4):
            out += encode_astc_block_2ep(
                img[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4])
    return bytes(out)


def decode_block_4x4(p: ASTCBlockParams) -> np.ndarray:
    """Decode one 4x4 block -> [4, 4, 4] u8 RGBA."""
    eps = []
    for sub in p.endpoints:
        vals = [unquant_color(p.endpoint_range, d, m) for (d, m) in sub]
        eps.append(decode_cem_ldr(p.cem, vals))
    n_w = 32 if p.dual_plane else 16
    if len(p.weights) != n_w:
        raise ValueError(f"expected {n_w} weights, got {len(p.weights)}")
    w = [unquant_weight(p.weight_range, d, m) for (d, m) in p.weights]
    out = np.zeros((4, 4, 4), np.uint8)
    for y in range(4):
        for x in range(4):
            t = y * 4 + x
            sub = (select_partition(p.partition_seed, x, y, p.partition_count)
                   if p.partition_count > 1 else 0)
            e0, e1 = eps[sub]
            if p.dual_plane:
                w0, w1 = w[2 * t], w[2 * t + 1]
                px = list(interpolate_unorm8(e0, e1, w0, p.srgb))
                alt = interpolate_unorm8(e0, e1, w1, p.srgb)
                px[p.ccs] = alt[p.ccs]
            else:
                px = list(interpolate_unorm8(e0, e1, w[t], p.srgb))
            out[y, x] = px
    return out
