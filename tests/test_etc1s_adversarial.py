"""Adversarial, spec-derived BasisLZ/ETC1S bitstream vectors.

VERDICT r2 item 7: the decoder (native/etc1s.cpp) was validated against
this repo's own conforming encoder — these vectors are instead assembled
BY HAND in this file with an independent bit-writer, making structural
choices the encoder never makes (deep Huffman tables, zero/repeat runs,
every endpoint-prediction mode, truncation at each structural boundary).
Expected RGBA is computed from the ETC1S math directly; failures must be
loud (ValueError / NotImplementedError), never silent misdecodes.
"""

import struct

import numpy as np
import pytest

from madrona_renderer_tpu.native import available, decode_basislz_native

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)

# --------------------------------------------------------------- writer --


class BitWriter:
    """LSB-first bit writer (DEFLATE convention, matching the decoder)."""

    def __init__(self):
        self.bits = []

    def put_bits(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code, length):
        """Huffman codes are consumed MSB-of-code-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


def canonical_codes(lens):
    """Canonical code assignment: by increasing length then symbol index
    (independent re-derivation of the decoder's init())."""
    count = [0] * 18
    for l in lens:
        if l:
            count[l] += 1
    first = [0] * 18
    code = 0
    for l in range(1, 17):
        first[l] = code
        code = (code + count[l]) << 1
    next_code = list(first)
    out = {}
    for l in range(1, 17):
        for sym, sl in enumerate(lens):
            if sl == l:
                out[sym] = (next_code[l], l)
                next_code[l] += 1
    return out


_CLEN_ORDER = [
    17, 18, 19, 20, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15, 16,
]


def write_table(bw, lens, ops=None):
    """Emit one Huffman table. `lens` is the symbol-length array;
    `ops` optionally overrides the code-length symbol sequence (list of
    (clen_sym, extra_value, extra_bits)) to exercise run encodings."""
    bw.put_bits(len(lens), 14)
    if not any(lens):
        raise AssertionError("use put_bits(0,14) directly for empty tables")
    if ops is None:
        ops = [(l, 0, 0) for l in lens]
    used = sorted({sym for sym, _, _ in ops})
    # Flat fixed-length clen code over the used symbols.
    clen_bits = max(1, (len(used) - 1).bit_length())
    clen_lens = [0] * 21
    for s in used:
        clen_lens[s] = clen_bits
    num_clen = max(_CLEN_ORDER.index(s) for s in used) + 1
    bw.put_bits(num_clen, 5)
    for i in range(num_clen):
        bw.put_bits(clen_lens[_CLEN_ORDER[i]], 3)
    codes = canonical_codes(clen_lens)
    for sym, extra, extra_bits in ops:
        c, l = codes[sym]
        bw.put_code(c, l)
        if extra_bits:
            bw.put_bits(extra, extra_bits)


def build_sgd(endpoints_blob, selectors_blob, tables_blob, n_ep, n_sel,
              rgb_len, flags=0):
    head = struct.pack("<2H4I", n_ep, n_sel, len(endpoints_blob),
                       len(selectors_blob), len(tables_blob), 0)
    desc = struct.pack("<5I", flags, 0, rgb_len, 0, 0)
    return head + desc + endpoints_blob + selectors_blob + tables_blob


_INTEN = np.asarray(
    [[-8, -2, 2, 8], [-17, -5, 5, 17], [-29, -9, 9, 29], [-42, -13, 13, 42],
     [-60, -18, 18, 60], [-80, -24, 24, 80], [-106, -33, 33, 106],
     [-183, -47, 47, 183]], np.int32)


def expand5(v):
    return (v << 3) | (v >> 2)


def expected_block(r5, g5, b5, inten, sels):
    out = np.zeros((4, 4, 4), np.uint8)
    out[..., 3] = 255
    base = np.asarray([expand5(r5), expand5(g5), expand5(b5)], np.int32)
    for py in range(4):
        for px in range(4):
            m = int(_INTEN[inten, sels[py * 4 + px]])
            out[py, px, :3] = np.clip(base + m, 0, 255)
    return out


def encode_endpoints(entries, color_lens, inten_lens, color_ops=None,
                     inten_ops=None):
    """entries = [(inten_delta, dr, dg, db)] applied to the DPCM state
    (prev=[16,16,16], prev_inten=0, &31 / &7 wraparound). The three color
    models here share one length table (all three transmitted)."""
    bw = BitWriter()
    for _ in range(3):
        write_table(bw, color_lens, color_ops)
    write_table(bw, inten_lens, inten_ops)
    bw.put_bits(0, 1)  # grayscale = 0
    ccodes = canonical_codes(color_lens)
    icodes = canonical_codes(inten_lens)
    prev = [16, 16, 16]
    prev_inten = 0
    decoded = []
    for di, dr, dg, db in entries:
        c, l = icodes[di]
        bw.put_code(c, l)
        prev_inten = (prev_inten + di) & 7
        for ci, d in enumerate((dr, dg, db)):
            # Model selection by prev value (all three models identical
            # here, but the bit order is per-model — emit accordingly).
            c, l = ccodes[d]
            bw.put_code(c, l)
            prev[ci] = (prev[ci] + d) & 31
        decoded.append((prev[0], prev[1], prev[2], prev_inten))
    return bw.bytes(), decoded


def encode_selectors(palettes):
    bw = BitWriter()
    bw.put_bits(0, 1)  # global
    bw.put_bits(0, 1)  # hybrid
    bw.put_bits(1, 1)  # raw
    for sels in palettes:
        for y in range(4):
            row = 0
            for x in range(4):
                row |= (sels[y * 4 + x] & 3) << (x * 2)
            bw.put_bits(row, 8)
    return bw.bytes()


def encode_tables(pred_lens, delta_lens, sel_lens):
    bw = BitWriter()
    write_table(bw, pred_lens)
    write_table(bw, delta_lens)
    write_table(bw, sel_lens)
    bw.put_bits(0, 14)  # selector-history RLE table: empty
    bw.put_bits(0, 13)  # selector history size 0
    return bw.bytes()


# --------------------------------------------------------------- vectors --


def test_all_endpoint_prediction_modes_exact_rgba():
    """8×8 image, 4 blocks in one 2×2 group: block (0,0) explicit,
    (1,0) left-pred, (0,1) above-pred, (1,1) left-pred. Two endpoints and
    two selector palettes; exact RGBA match against the ETC1S math."""
    entries = [(2, 3, -5 & 31, 0), (1, 4, 4, 4)]
    color_lens = [0] * 32
    for s in {3, -5 & 31, 0, 4}:
        color_lens[s] = 2
    inten_lens = [0] * 8
    inten_lens[1] = 1
    inten_lens[2] = 2
    inten_lens[0] = 2
    ep_blob, eps = encode_endpoints(entries, color_lens, inten_lens)
    sel0 = [0, 1, 2, 3] * 4
    sel1 = [3, 2, 1, 0] * 4
    sel_blob = encode_selectors([sel0, sel1])

    # Pred byte: slots (0,0)=explicit(3), (1,0)=left(0), (0,1)=above(1),
    # (1,1)=left(0) → 3 | 0<<2 | 1<<4 | 0<<6 = 19.
    pred_lens = [0] * 20
    pred_lens[19] = 1
    delta_lens = [0, 1, 2, 2]  # deltas 1 and 2 usable, plus 3
    sel_lens = [1, 1]
    tab_blob = encode_tables(pred_lens, delta_lens, sel_lens)

    bw = BitWriter()
    pc = canonical_codes(pred_lens)
    dc = canonical_codes(delta_lens)
    sc = canonical_codes(sel_lens)
    bw.put_code(*pc[19])          # group pred byte
    bw.put_code(*dc[1])           # block (0,0): ep = (0+1) % 2 = 1
    bw.put_code(*sc[0])           # selector 0
    bw.put_code(*sc[1])           # block (1,0): left-pred ep=1, selector 1
    bw.put_code(*sc[1])           # block (0,1): above-pred ep=1, selector 1
    bw.put_code(*sc[0])           # block (1,1): left-pred ep=1, selector 0
    slice_blob = bw.bytes()

    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 2, 2, len(slice_blob))
    img = decode_basislz_native(sgd, slice_blob, 8, 8)

    r, g, b, it = eps[1]
    exp = np.zeros((8, 8, 4), np.uint8)
    exp[0:4, 0:4] = expected_block(r, g, b, it, sel0)
    exp[0:4, 4:8] = expected_block(r, g, b, it, sel1)
    exp[4:8, 0:4] = expected_block(r, g, b, it, sel1)
    exp[4:8, 4:8] = expected_block(r, g, b, it, sel0)
    np.testing.assert_array_equal(img, exp)


def test_max_depth_huffman_and_dpcm_wraparound():
    """Delta-endpoint table with code lengths 1..16 (a full binary-depth
    canonical code); endpoint DPCM exercising &31 / &7 wraparound."""
    n_ep = 17
    entries = []
    # Wraparound: inten deltas summing past 7, color deltas past 31.
    for i in range(n_ep):
        entries.append((5, 20, 31, 17))
    color_lens = [0] * 32
    color_lens[20] = 1
    color_lens[31] = 2
    color_lens[17] = 2
    inten_lens = [0] * 8
    inten_lens[5] = 1
    ep_blob, eps = encode_endpoints(entries, color_lens, inten_lens)
    # inten walks 5,2,7,4,... (&7); colors walk with &31 wrap.
    assert eps[1][3] == (5 + 5) & 7
    assert eps[1][0] == (16 + 20 + 20) & 31

    sel_blob = encode_selectors([[2] * 16])
    pred_lens = [0] * 4
    pred_lens[3] = 1  # all four blocks explicit
    # Depth-16 canonical code: lengths 1,2,...,15,16,16 (Kraft-complete).
    delta_lens = list(range(1, 16)) + [16, 16]
    sel_lens = [0] * 2
    sel_lens[0] = 1
    tab_blob = encode_tables(pred_lens, delta_lens, sel_lens)

    bw = BitWriter()
    pc = canonical_codes(pred_lens)
    dc = canonical_codes(delta_lens)
    sc = canonical_codes(sel_lens)
    # Single 4×4 block: group pred (slot 0 = explicit), deep delta 16.
    bw.put_code(*pc[3])
    bw.put_code(*dc[16])  # 16-bit code; ep = 16 % 17 = 16
    bw.put_code(*sc[0])
    slice_blob = bw.bytes()

    sgd = build_sgd(ep_blob, sel_blob, tab_blob, n_ep, 1, len(slice_blob))
    img = decode_basislz_native(sgd, slice_blob, 4, 4)
    r, g, b, it = eps[16]
    np.testing.assert_array_equal(
        img, expected_block(r, g, b, it, [2] * 16))


def test_single_symbol_tables_and_runs():
    """1-symbol Huffman tables everywhere (decoded as a 1-bit zero code),
    plus zero-run and repeat-run clen encodings."""
    # Endpoint palette: one entry; color table transmitted via a
    # small-zero-run + explicit + big-zero-run layout; inten via repeat.
    color_lens = [0] * 32
    color_lens[7] = 1
    color_ops = [
        (17, 4, 3),       # small zero run: 3 + 4 = 7 zeros (syms 0..6)
        (1, 0, 0),        # sym 7: length 1
        (18, 13, 7),      # big zero run: 11 + 13 = 24 zeros (syms 8..31)
    ]
    inten_lens = [2, 2, 2, 2]  # repeat run after one explicit
    inten_ops = [
        (2, 0, 0),        # sym 0: length 2
        (19, 0, 2),       # small repeat: 3 + 0 = 3 more 2s (syms 1..3)
        (17, 1, 3),       # small zero run: 3 + 1 = 4 zeros (syms 4..7)
    ]
    ep_blob, eps = encode_endpoints(
        [(3, 7, 7, 7)], color_lens[:32], inten_lens + [0] * 4,
        color_ops=color_ops, inten_ops=inten_ops)
    sel_blob = encode_selectors([[1] * 16])
    pred_lens = [0] * 4
    pred_lens[3] = 1
    delta_lens = [1]      # single-symbol delta table
    sel_lens = [1]        # single-symbol selector table
    tab_blob = encode_tables(pred_lens, delta_lens, sel_lens)

    bw = BitWriter()
    bw.put_code(*canonical_codes(pred_lens)[3])
    bw.put_code(0, 1)     # single-symbol delta: 1-bit zero code
    bw.put_code(0, 1)     # single-symbol selector
    slice_blob = bw.bytes()

    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 1, 1, len(slice_blob))
    img = decode_basislz_native(sgd, slice_blob, 4, 4)
    r, g, b, it = eps[0]
    np.testing.assert_array_equal(
        img, expected_block(r, g, b, it, [1] * 16))


def _good_vector():
    """A small known-good vector reused by the failure tests."""
    color_lens = [0] * 32
    color_lens[0] = 1
    inten_lens = [1] + [0] * 7
    ep_blob, eps = encode_endpoints([(0, 0, 0, 0)], color_lens, inten_lens)
    sel_blob = encode_selectors([[0] * 16])
    pred_lens = [0] * 4
    pred_lens[3] = 1
    tab_blob = encode_tables(pred_lens, [1], [1])
    bw = BitWriter()
    bw.put_code(*canonical_codes(pred_lens)[3])
    bw.put_code(0, 1)
    bw.put_code(0, 1)
    slice_blob = bw.bytes()
    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 1, 1, len(slice_blob))
    return sgd, slice_blob, eps


def test_good_vector_sanity():
    sgd, slice_blob, eps = _good_vector()
    img = decode_basislz_native(sgd, slice_blob, 4, 4)
    r, g, b, it = eps[0]
    np.testing.assert_array_equal(
        img, expected_block(r, g, b, it, [0] * 16))


def test_truncation_at_every_boundary_fails_loudly():
    """Truncating the stream at every structural boundary must raise —
    never crash, never return fabricated pixels."""
    sgd, slice_blob, _ = _good_vector()
    # sgd truncations: header, imageDesc, each blob boundary.
    for cut in [0, 1, 4, 19, 20, 25, 39, len(sgd) - 1]:
        with pytest.raises((ValueError, NotImplementedError)):
            decode_basislz_native(sgd[:cut], slice_blob, 4, 4)
    # level truncations (slice stream).
    for cut in range(len(slice_blob)):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_basislz_native(sgd, slice_blob[:cut], 4, 4)


def test_left_pred_in_column0_fails():
    sgd_parts = _good_vector()
    color_lens = [0] * 32
    color_lens[0] = 1
    ep_blob, _ = encode_endpoints([(0, 0, 0, 0)], color_lens,
                                  [1] + [0] * 7)
    sel_blob = encode_selectors([[0] * 16])
    pred_lens = [1]  # only symbol 0 = all-left pred byte
    tab_blob = encode_tables(pred_lens, [1], [1])
    bw = BitWriter()
    bw.put_code(0, 1)  # pred byte 0 → block (0,0) left-pred: invalid
    slice_blob = bw.bytes() or b"\x00"
    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 1, 1, len(slice_blob))
    with pytest.raises(ValueError, match="left-pred"):
        decode_basislz_native(sgd, slice_blob, 4, 4)
    del sgd_parts


def test_above_pred_in_row0_fails():
    color_lens = [0] * 32
    color_lens[0] = 1
    ep_blob, _ = encode_endpoints([(0, 0, 0, 0)], color_lens,
                                  [1] + [0] * 7)
    sel_blob = encode_selectors([[0] * 16])
    # Pred byte: slot0 explicit, slot1 above (invalid at row 0) = 3|1<<2=7.
    pred_lens = [0] * 8
    pred_lens[7] = 1
    tab_blob = encode_tables(pred_lens, [1], [1])
    bw = BitWriter()
    bw.put_code(*canonical_codes(pred_lens)[7])
    bw.put_code(0, 1)  # block (0,0) explicit delta
    bw.put_code(0, 1)  # selector
    slice_blob = bw.bytes()
    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 1, 1, len(slice_blob))
    with pytest.raises(ValueError, match="above-pred"):
        decode_basislz_native(sgd, slice_blob, 8, 4)


def test_pred_mode2_unsupported_is_loud():
    color_lens = [0] * 32
    color_lens[0] = 1
    ep_blob, _ = encode_endpoints([(0, 0, 0, 0)], color_lens,
                                  [1] + [0] * 7)
    sel_blob = encode_selectors([[0] * 16])
    pred_lens = [0] * 3
    pred_lens[2] = 1  # slot0 = mode 2 (CR/near-repeat)
    tab_blob = encode_tables(pred_lens, [1], [1])
    bw = BitWriter()
    bw.put_code(*canonical_codes(pred_lens)[2])
    slice_blob = bw.bytes()
    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 1, 1, len(slice_blob))
    with pytest.raises(NotImplementedError, match="prediction mode 2"):
        decode_basislz_native(sgd, slice_blob, 4, 4)


def test_selector_history_symbol_is_loud():
    """Selector symbol ≥ palette size = a history reference → loud."""
    color_lens = [0] * 32
    color_lens[0] = 1
    ep_blob, _ = encode_endpoints([(0, 0, 0, 0)], color_lens,
                                  [1] + [0] * 7)
    sel_blob = encode_selectors([[0] * 16])
    pred_lens = [0] * 4
    pred_lens[3] = 1
    sel_lens = [1, 1]  # 2 symbols but only 1 palette entry
    tab_blob = encode_tables(pred_lens, [1], sel_lens)
    bw = BitWriter()
    bw.put_code(*canonical_codes(pred_lens)[3])
    bw.put_code(0, 1)
    bw.put_code(*canonical_codes(sel_lens)[1])  # sym 1 ≥ num_sel 1
    slice_blob = bw.bytes()
    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 1, 1, len(slice_blob))
    with pytest.raises(NotImplementedError, match="history"):
        decode_basislz_native(sgd, slice_blob, 4, 4)


def test_oversubscribed_huffman_fails():
    """Kraft-violating table (three 1-bit codes) must be rejected."""
    color_lens = [0] * 32
    color_lens[0] = color_lens[1] = color_lens[2] = 1  # over-subscribed
    bw = BitWriter()
    try:
        write_table(bw, color_lens)
    except Exception:
        pytest.skip("writer refuses; assemble manually")
    blob = bw.bytes()
    # Stuff it into the endpoints position; decode must fail cleanly.
    sel_blob = encode_selectors([[0] * 16])
    tab_blob = encode_tables([0, 0, 0, 1], [1], [1])
    sgd = build_sgd(blob, sel_blob, tab_blob, 1, 1, 1)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_basislz_native(sgd, b"\x00", 4, 4)


def test_repeat_with_no_prior_code_fails():
    bw = BitWriter()
    bw.put_bits(8, 14)   # total_used_syms
    used = [19]          # small repeat first — no prior nonzero length
    clen_lens = [0] * 21
    clen_lens[19] = 1
    bw.put_bits(_CLEN_ORDER.index(19) + 1, 5)
    for i in range(_CLEN_ORDER.index(19) + 1):
        bw.put_bits(clen_lens[_CLEN_ORDER[i]], 3)
    bw.put_code(0, 1)    # the repeat symbol
    bw.put_bits(0, 2)
    blob = bw.bytes()
    sel_blob = encode_selectors([[0] * 16])
    tab_blob = encode_tables([0, 0, 0, 1], [1], [1])
    sgd = build_sgd(blob, sel_blob, tab_blob, 1, 1, 1)
    with pytest.raises(ValueError, match="repeat|prior"):
        decode_basislz_native(sgd, b"\x00", 4, 4)
    del used


def test_zero_run_past_symbol_count_fails():
    bw = BitWriter()
    bw.put_bits(4, 14)   # only 4 symbols ...
    clen_lens = [0] * 21
    clen_lens[18] = 1
    bw.put_bits(_CLEN_ORDER.index(18) + 1, 5)
    for i in range(_CLEN_ORDER.index(18) + 1):
        bw.put_bits(clen_lens[_CLEN_ORDER[i]], 3)
    bw.put_code(0, 1)    # big zero run
    bw.put_bits(127, 7)  # ... but run = 11 + 127 = 138
    blob = bw.bytes()
    sel_blob = encode_selectors([[0] * 16])
    tab_blob = encode_tables([0, 0, 0, 1], [1], [1])
    sgd = build_sgd(blob, sel_blob, tab_blob, 1, 1, 1)
    with pytest.raises(ValueError, match="run|symbol"):
        decode_basislz_native(sgd, b"\x00", 4, 4)


def test_grayscale_endpoint_palette():
    """grayscale=1: one color delta per endpoint, replicated to g/b —
    a decoder branch no encoder-generated fixture exercises."""
    bw = BitWriter()
    color_lens = [0] * 32
    color_lens[5] = 1
    for _ in range(3):
        write_table(bw, color_lens)
    inten_lens = [0] * 8
    inten_lens[2] = 1
    write_table(bw, inten_lens)
    bw.put_bits(1, 1)  # grayscale = 1
    ccodes = canonical_codes(color_lens)
    icodes = canonical_codes(inten_lens)
    # Two endpoints: inten walks 2, 4; gray walks 16+5=21, +5 → 26.
    for _ in range(2):
        bw.put_code(*icodes[2])
        bw.put_code(*ccodes[5])  # ONE channel only in grayscale mode
    ep_blob = bw.bytes()

    sel_blob = encode_selectors([[0] * 16, [3] * 16])
    pred_lens = [0] * 4
    pred_lens[3] = 1
    delta_lens = [1, 2, 2]
    sel_lens = [1, 1]
    tab_blob = encode_tables(pred_lens, delta_lens, sel_lens)
    bw = BitWriter()
    dc = canonical_codes(delta_lens)
    sc = canonical_codes(sel_lens)
    bw.put_code(*canonical_codes(pred_lens)[3])
    bw.put_code(*dc[2])  # ep = (0+2) % 2 = 0 → endpoint 0 (gray 21)
    bw.put_code(*sc[1])  # selector palette 1 (all +b)
    slice_blob = bw.bytes()
    sgd = build_sgd(ep_blob, sel_blob, tab_blob, 2, 2, len(slice_blob))
    img = decode_basislz_native(sgd, slice_blob, 4, 4)
    exp = expected_block(21, 21, 21, 2, [3] * 16)
    np.testing.assert_array_equal(img, exp)
    # Gray: r == g == b everywhere.
    assert (img[..., 0] == img[..., 1]).all()
    assert (img[..., 1] == img[..., 2]).all()
