"""BasisLZ / ETC1S KTX2 *encoder* — fixture generator.

Produces KTX2 files with supercompressionScheme 1 (BasisLZ) whose streams
the native decoder (native/etc1s.cpp) accepts: canonical-Huffman entropy
layer, DPCM endpoint palette, raw selector palette, 2×2-group endpoint
prediction (left / above / explicit-delta). The encoder is a real — if
basic — ETC1S compressor: per 4×4 block it picks the best 5:5:5 base
color + intensity table + per-pixel selectors, deduplicates endpoints and
selector patterns into global codebooks, and entropy-codes the slice.

Exists because the reference repo ships no .ktx2 fixture and this sandbox
has no Basis encoder; see etc1s.cpp's header for the format-source
provenance story. Used by tests (a Basis-compressed KTX2 fixture must
load and render — VERDICT r1 #6) and by users who want to exercise the
BasisLZ input path end-to-end.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

_KTX2_MAGIC = b"\xabKTX 20\xbb\r\n\x1a\n"

# Khronos ETC1 intensity modifier tables, selectors ordered {-b,-a,+a,+b}
# (must match etc1s.cpp kInten).
_INTEN = np.asarray(
    [
        [-8, -2, 2, 8], [-17, -5, 5, 17], [-29, -9, 9, 29],
        [-42, -13, 13, 42], [-60, -18, 18, 60], [-80, -24, 24, 80],
        [-106, -33, 33, 106], [-183, -47, 47, 183],
    ],
    np.int32,
)

_CLEN_ORDER = [17, 18, 19, 20, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15, 16]


class BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def put_bits(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        # Huffman codes go MSB-of-code first (decoder extends at the LSB).
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)


def _canonical_lengths(freqs: List[int], max_len: int = 16) -> List[int]:
    """Code lengths from frequencies (package-merge-free: Huffman tree with
    depth clamp via frequency flooring — fine for fixture-sized alphabets)."""
    n = len(freqs)
    active = [(f, i) for i, f in enumerate(freqs) if f > 0]
    if not active:
        return [0] * n
    if len(active) == 1:
        out = [0] * n
        out[active[0][1]] = 1
        return out
    import heapq

    heap = [(f, [i]) for f, i in active]
    heapq.heapify(heap)
    depth = [0] * n
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for i in s1 + s2:
            depth[i] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    if max(depth) > max_len:
        # Flatten: equal lengths via ceil(log2(count)) — always ≤ 16 for
        # our alphabet sizes, and a valid (complete-enough) code.
        k = max(1, (len(active) - 1).bit_length())
        depth = [0] * n
        for _, i in active:
            depth[i] = k
    return depth


def _canonical_codes(lengths: List[int]) -> Dict[int, Tuple[int, int]]:
    """Symbol → (code, length), canonical (by length, then symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class HuffEncoder:
    def __init__(self, freqs: List[int]):
        self.lengths = _canonical_lengths(freqs)
        self.codes = _canonical_codes(self.lengths)

    def write_table(self, bw: BitWriter) -> None:
        used = len(self.lengths)
        while used > 1 and self.lengths[used - 1] == 0:
            used -= 1
        if not any(self.lengths):
            bw.put_bits(0, 14)
            return
        bw.put_bits(used, 14)
        # Code-length code: plain literals (no run symbols on the encode
        # side; the decoder supports both).
        clen_freqs = [0] * 21
        for l in self.lengths[:used]:
            clen_freqs[l] += 1
        clen_enc = HuffEncoder.__new__(HuffEncoder)
        clen_enc.lengths = _canonical_lengths(clen_freqs, max_len=7)
        clen_enc.codes = _canonical_codes(clen_enc.lengths)
        bw.put_bits(21, 5)
        for sym in _CLEN_ORDER:
            bw.put_bits(clen_enc.lengths[sym], 3)
        for l in self.lengths[:used]:
            c, ln = clen_enc.codes[l]
            bw.put_code(c, ln)

    def write_sym(self, bw: BitWriter, sym: int) -> None:
        c, l = self.codes[sym]
        bw.put_code(c, l)


def _encode_blocks(img: np.ndarray):
    """RGBA8 [H, W, 4] → per-block (endpoint, selector) with global
    codebooks. Returns (endpoints [(r5,g5,b5,inten)], selectors [16-tuple],
    block_ep [bh, bw], block_sel [bh, bw])."""
    h, w = img.shape[:2]
    bh, bw = (h + 3) // 4, (w + 3) // 4
    pad = np.zeros((bh * 4, bw * 4, 3), np.float32)
    pad[:h, :w] = img[..., :3].astype(np.float32)
    # Replicate edges so padding doesn't skew block fits.
    pad[h:, :w] = pad[h - 1 : h, :w]
    pad[:, w:] = pad[:, w - 1 : w]

    blocks = pad.reshape(bh, 4, bw, 4, 3).transpose(0, 2, 1, 3, 4)
    mean = blocks.mean(axis=(2, 3))  # [bh, bw, 3]
    base5 = np.clip(np.round(mean / 255.0 * 31.0), 0, 31).astype(np.int32)
    base8 = (base5 << 3) | (base5 >> 2)  # [bh, bw, 3]

    # Pick the intensity table + selectors minimizing squared error:
    # luma residual per pixel vs each table's 4 modifiers.
    resid = blocks - base8[:, :, None, None, :].astype(np.float32)
    rl = resid.mean(axis=-1)  # [bh, bw, 4, 4] luma residual
    # [bh, bw, 4, 4, 8 tables, 4 sels]
    diff = rl[..., None, None] - _INTEN[None, None, None, None].astype(np.float32)
    err = diff * diff
    best_sel = err.argmin(axis=-1)  # [bh, bw, 4, 4, 8]
    per_table = np.take_along_axis(err, best_sel[..., None], axis=-1)[..., 0]
    table_err = per_table.sum(axis=(2, 3))  # [bh, bw, 8]
    inten = table_err.argmin(axis=-1)  # [bh, bw]
    sel = np.take_along_axis(
        best_sel, inten[:, :, None, None, None], axis=-1
    )[..., 0]  # [bh, bw, 4, 4]

    endpoints: List[Tuple[int, int, int, int]] = []
    ep_lut: Dict[Tuple[int, int, int, int], int] = {}
    selectors: List[Tuple[int, ...]] = []
    sel_lut: Dict[Tuple[int, ...], int] = {}
    block_ep = np.zeros((bh, bw), np.int32)
    block_sel = np.zeros((bh, bw), np.int32)
    for by in range(bh):
        for bx in range(bw):
            e = (int(base5[by, bx, 0]), int(base5[by, bx, 1]),
                 int(base5[by, bx, 2]), int(inten[by, bx]))
            if e not in ep_lut:
                ep_lut[e] = len(endpoints)
                endpoints.append(e)
            block_ep[by, bx] = ep_lut[e]
            s = tuple(int(v) for v in sel[by, bx].reshape(-1))
            if s not in sel_lut:
                sel_lut[s] = len(selectors)
                selectors.append(s)
            block_sel[by, bx] = sel_lut[s]
    return endpoints, selectors, block_ep, block_sel


def _encode_endpoint_stream(endpoints) -> bytes:
    # DPCM symbols first (to build frequencies), then emit.
    prev = [16, 16, 16]
    prev_inten = 0
    syms: List[Tuple[int, int]] = []  # (model 0-2 or 3=inten, symbol)
    for r, g, b, inten in endpoints:
        syms.append((3, (inten - prev_inten) & 7))
        prev_inten = inten
        for c, v in enumerate((r, g, b)):
            # Model chosen by the previous component's range (must match
            # etc1s.cpp decode_endpoints).
            model = 0 if prev[c] <= 9 else (1 if prev[c] <= 21 else 2)
            syms.append((model, (v - prev[c]) & 31))
            prev[c] = v
    freqs = [[0] * 32 for _ in range(3)] + [[0] * 8]
    for m, s in syms:
        freqs[m][s] += 1
    encs = [HuffEncoder(f) for f in freqs]
    bw = BitWriter()
    for e in encs[:3]:
        e.write_table(bw)
    encs[3].write_table(bw)
    bw.put_bits(0, 1)  # not grayscale
    for m, s in syms:
        encs[m].write_sym(bw, s)
    return bw.bytes()


def _encode_selector_stream(selectors) -> bytes:
    bw = BitWriter()
    bw.put_bits(0, 1)  # no global codebook
    bw.put_bits(0, 1)  # no hybrid codebook
    bw.put_bits(1, 1)  # raw encoding
    for s in selectors:
        for y in range(4):
            row = 0
            for x in range(4):
                row |= s[y * 4 + x] << (x * 2)
            bw.put_bits(row, 8)
    return bw.bytes()


_PRED_LEFT, _PRED_ABOVE, _PRED_EXPLICIT = 0, 1, 3


def _slice_symbols(block_ep, block_sel, num_ep):
    """Walk blocks in raster order producing (pred bytes per 2×2 group,
    explicit endpoint deltas, selector syms)."""
    bh, bw = block_ep.shape
    group_syms: List[int] = []
    deltas: List[int] = []
    sel_syms: List[int] = []
    prev_ep = 0
    # Precompute per-block pred choice.
    preds = np.full((bh, bw), _PRED_EXPLICIT, np.int32)
    for by in range(bh):
        for bx in range(bw):
            if bx > 0 and block_ep[by, bx] == block_ep[by, bx - 1]:
                preds[by, bx] = _PRED_LEFT
            elif by > 0 and block_ep[by, bx] == block_ep[by - 1, bx]:
                preds[by, bx] = _PRED_ABOVE
    for by in range(bh):
        for bx in range(bw):
            if bx % 2 == 0 and by % 2 == 0:
                bits = 0
                for slot in range(4):
                    sy, sx = by + slot // 2, bx + slot % 2
                    p = (
                        int(preds[sy, sx])
                        if sy < bh and sx < bw
                        else _PRED_EXPLICIT
                    )
                    # Slots outside the image are never decoded; explicit
                    # costs nothing extra for them.
                    if sy < bh and sx < bw:
                        bits |= p << (slot * 2)
                    else:
                        bits |= _PRED_EXPLICIT << (slot * 2)
                group_syms.append(bits)
            if preds[by, bx] == _PRED_EXPLICIT:
                deltas.append((int(block_ep[by, bx]) - prev_ep) % num_ep)
            prev_ep = int(block_ep[by, bx])
            sel_syms.append(int(block_sel[by, bx]))
    return group_syms, deltas, sel_syms


def _encode_tables_and_slice(block_ep, block_sel, num_ep, num_sel):
    group_syms, deltas, sel_syms = _slice_symbols(block_ep, block_sel, num_ep)
    gfreq = [0] * 256
    for s in group_syms:
        gfreq[s] += 1
    dfreq = [0] * max(num_ep, 1)
    for d in deltas:
        dfreq[d] += 1
    if not deltas:
        dfreq[0] += 1  # decoder requires a non-empty table definition
    sfreq = [0] * num_sel
    for s in sel_syms:
        sfreq[s] += 1
    g_enc, d_enc, s_enc = HuffEncoder(gfreq), HuffEncoder(dfreq), HuffEncoder(sfreq)

    tables = BitWriter()
    g_enc.write_table(tables)
    d_enc.write_table(tables)
    s_enc.write_table(tables)
    HuffEncoder([1]).write_table(tables)  # selector-history RLE: unused
    tables.put_bits(0, 13)  # selector history buffer size 0

    bh, bw = block_ep.shape
    sl = BitWriter()
    preds_iter = iter(group_syms)
    deltas_iter = iter(deltas)
    sels_iter = iter(sel_syms)
    # Row of group-prediction bytes (one per 2×2 group column) — the
    # group's lower blocks, visited one block-row later, read their slots
    # from here (must mirror etc1s.cpp decode_slice).
    group_row = [0] * ((bw + 1) // 2)
    for by in range(bh):
        for bx in range(bw):
            if bx % 2 == 0 and by % 2 == 0:
                group_row[bx // 2] = next(preds_iter)
                g_enc.write_sym(sl, group_row[bx // 2])
            slot = (by % 2) * 2 + (bx % 2)
            pred = (group_row[bx // 2] >> (slot * 2)) & 3
            if pred == _PRED_EXPLICIT:
                d_enc.write_sym(sl, next(deltas_iter))
            s_enc.write_sym(sl, next(sels_iter))
    return tables.bytes(), sl.bytes()


def encode_ktx2_etc1s(image: np.ndarray, srgb: bool = False) -> bytes:
    """RGBA8 [H, W, 4] → single-level KTX2 with BasisLZ (ETC1S)
    supercompression. Lossy (ETC1S is a block format); alpha is dropped
    (opaque RGB slice only, matching the common basisu default)."""
    img = np.ascontiguousarray(np.asarray(image, np.uint8))
    h, w = img.shape[:2]
    endpoints, selectors, block_ep, block_sel = _encode_blocks(img)
    ep_stream = _encode_endpoint_stream(endpoints)
    sel_stream = _encode_selector_stream(selectors)
    tab_stream, slice_stream = _encode_tables_and_slice(
        block_ep, block_sel, len(endpoints), len(selectors)
    )

    image_desc = struct.pack("<5I", 0, 0, len(slice_stream), 0, 0)
    sgd = (
        struct.pack(
            "<2H4I", len(endpoints), len(selectors), len(ep_stream),
            len(sel_stream), len(tab_stream), 0,
        )
        + image_desc
        + ep_stream
        + sel_stream
        + tab_stream
    )

    # KTX2 container: vkFormat UNDEFINED (0), scheme 1.
    header = _KTX2_MAGIC + struct.pack("<9I", 0, 1, w, h, 0, 0, 1, 1, 1)
    # index: dfd off/len (u32 ×2), kvd off/len (u32 ×2), sgd off/len (u64 ×2)
    level_index_size = 24
    index_size = 2 * 4 + 2 * 4 + 2 * 8
    sgd_offset = len(header) + index_size + level_index_size
    data_offset = sgd_offset + len(sgd)
    index_fixed = struct.pack("<2I2I2Q", 0, 0, 0, 0, sgd_offset, len(sgd))
    level_index = struct.pack(
        "<3Q", data_offset, len(slice_stream), len(slice_stream)
    )
    return header + index_fixed + level_index + sgd + slice_stream
