"""Independent pure-Python BasisLZ/ETC1S decoder — the second source.

native/etc1s.cpp is the production decoder (its header carries the
format-provenance argument). In a zero-egress sandbox no real
basisu-encoded sample exists to validate against, so this module is the
next best thing (VERDICT r3 #8): a second, independently-written
implementation of the same published format layers — canonical-Huffman
entropy coding, DPCM endpoint palette, raw selector palette, 2x2-group
endpoint prediction, ETC1S block math — differential-fuzzed against the
native decoder in CI (tests/test_etc1s_differential.py). Two readings
of the same spec catching each other's misreadings is the strongest
offline substitute for ground-truth samples.

Written against the format layers as published (KTX2 suppl. / Basis
ETC1S description; ETC1 block math from the Khronos ETC1 spec), NOT by
translating the C++ — divergences between the two are the signal the
fuzz harness exists to surface.

Intentional loud gates (match the production decoder's documented
subset): non-raw selector palettes, selector history, prediction code 2
(the unused 'history' slot) all raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np

# Khronos ETC1 intensity modifier table, selector order {-b, -a, +a, +b}.
_INTEN = [
    [-8, -2, 2, 8], [-17, -5, 5, 17], [-29, -9, 9, 29],
    [-42, -13, 13, 42], [-60, -18, 18, 60], [-80, -24, 24, 80],
    [-106, -33, 33, 106], [-183, -47, 47, 183],
]

# Code-length-code symbol transmission order (DEFLATE-style scrambling).
_CLEN_ORDER = [17, 18, 19, 20, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
               14, 1, 15, 16]


class _Bits:
    """LSB-first bit reader; Huffman codes extend MSB-first."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("ETC1S bitstream overrun")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, k: int) -> int:
        v = 0
        for i in range(k):
            v |= self.bit() << i
        return v


class _Huff:
    """Canonical Huffman decoder (lengths -> codes by (len, sym))."""

    def __init__(self, lengths: list[int]):
        self.max_len = max(lengths) if any(lengths) else 0
        table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for ln, sym in sorted((l, s) for s, l in enumerate(lengths) if l):
            code <<= ln - prev_len
            table[(ln, code)] = sym
            code += 1
            prev_len = ln
        self.table = table

    def read(self, br: _Bits) -> int:
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("ETC1S: invalid Huffman code")


def _read_huff_table(br: _Bits) -> _Huff | None:
    """Read one transmitted Huffman table (None = empty/absent)."""
    used = br.bits(14)
    if used == 0:
        return None
    if used > 1 << 13:
        raise ValueError("ETC1S: Huffman symbol count out of range")
    n_clen = br.bits(5)
    if n_clen == 0 or n_clen > 21:
        raise ValueError("ETC1S: bad code-length-code count")
    clen_lengths = [0] * 21
    for i in range(n_clen):
        clen_lengths[_CLEN_ORDER[i]] = br.bits(3)
    clen = _Huff(clen_lengths)
    lengths: list[int] = []
    while len(lengths) < used:
        sym = clen.read(br)
        if sym <= 16:
            lengths.append(sym)
        elif sym == 17:  # short zero run
            lengths += [0] * (3 + br.bits(3))
        elif sym == 18:  # long zero run
            lengths += [0] * (11 + br.bits(7))
        elif sym == 19:  # short repeat of previous length
            if not lengths:
                raise ValueError("ETC1S: repeat with no previous length")
            lengths += [lengths[-1]] * (3 + br.bits(2))
        else:  # 20: long repeat
            if not lengths:
                raise ValueError("ETC1S: repeat with no previous length")
            lengths += [lengths[-1]] * (7 + br.bits(7))
    if len(lengths) != used:
        raise ValueError("ETC1S: code-length runs overshoot the table")
    return _Huff(lengths)


def _decode_endpoints(stream: bytes, count: int) -> list[tuple[int, int, int, int]]:
    br = _Bits(stream)
    color_models = [_read_huff_table(br) for _ in range(3)]
    inten_model = _read_huff_table(br)
    grayscale = br.bit()
    prev = [16, 16, 16]
    prev_inten = 0
    out = []
    for _ in range(count):
        if inten_model is None:
            raise ValueError("ETC1S: missing intensity model")
        prev_inten = (prev_inten + inten_model.read(br)) & 7
        rgb = [0, 0, 0]
        for c in range(3 if not grayscale else 1):
            model_i = 0 if prev[c] <= 9 else (1 if prev[c] <= 21 else 2)
            model = color_models[model_i]
            if model is None:
                raise ValueError("ETC1S: missing color model")
            prev[c] = (prev[c] + model.read(br)) & 31
            rgb[c] = prev[c]
        if grayscale:
            rgb[1] = rgb[2] = rgb[0]
            prev[1] = prev[2] = prev[0]
        out.append((rgb[0], rgb[1], rgb[2], prev_inten))
    return out


def _decode_selectors(stream: bytes, count: int) -> list[list[int]]:
    br = _Bits(stream)
    global_cb = br.bit()
    hybrid = br.bit()
    raw = br.bit()
    if global_cb or hybrid or not raw:
        raise ValueError(
            "ETC1S: only raw selector palettes are in the documented "
            "subset (global/hybrid codebooks gate loudly)"
        )
    out = []
    for _ in range(count):
        sel = [0] * 16
        for y in range(4):
            row = br.bits(8)
            for x in range(4):
                sel[y * 4 + x] = (row >> (x * 2)) & 3
        out.append(sel)
    return out


_PRED_LEFT, _PRED_ABOVE, _PRED_HISTORY, _PRED_EXPLICIT = 0, 1, 2, 3


def decode_basislz_py(sgd: bytes, payload: bytes, width: int,
                      height: int) -> np.ndarray:
    """Decode BasisLZ supercompressionGlobalData + one ETC1S RGB slice
    -> RGBA8 [H, W, 4]. Pure-Python second source of
    native/etc1s.cpp::decode_basislz."""
    if len(sgd) < 20:
        raise ValueError("ETC1S: truncated global data header")
    (num_ep, num_sel, ep_bytes, sel_bytes, tab_bytes,
     ext_bytes) = struct.unpack_from("<2H4I", sgd, 0)
    if num_ep == 0 or num_sel == 0:
        raise ValueError("ETC1S: empty codebooks")
    # imageDesc array follows (one per image here): 5 u32s.
    desc_off = 20
    if len(sgd) < desc_off + 20:
        raise ValueError("ETC1S: missing imageDesc")
    (_flags, rgb_off, rgb_len, _a_off, _a_len) = struct.unpack_from(
        "<5I", sgd, desc_off)
    streams_off = desc_off + 20
    need = streams_off + ep_bytes + sel_bytes + tab_bytes + ext_bytes
    if len(sgd) < need:
        raise ValueError("ETC1S: global data shorter than stream sizes")
    ep_stream = sgd[streams_off:streams_off + ep_bytes]
    sel_stream = sgd[streams_off + ep_bytes:
                     streams_off + ep_bytes + sel_bytes]
    tab_stream = sgd[streams_off + ep_bytes + sel_bytes:
                     streams_off + ep_bytes + sel_bytes + tab_bytes]

    endpoints = _decode_endpoints(ep_stream, num_ep)
    selectors = _decode_selectors(sel_stream, num_sel)

    tb = _Bits(tab_stream)
    g_huff = _read_huff_table(tb)
    d_huff = _read_huff_table(tb)
    s_huff = _read_huff_table(tb)
    _hist_huff = _read_huff_table(tb)
    hist_size = tb.bits(13)
    if hist_size:
        raise ValueError(
            "ETC1S: selector history is outside the documented subset"
        )

    if rgb_len == 0 or rgb_off + rgb_len > len(payload):
        raise ValueError("ETC1S: slice range outside payload")
    sl = _Bits(payload[rgb_off:rgb_off + rgb_len])

    bw = (width + 3) // 4
    bh = (height + 3) // 4
    block_ep = np.zeros((bh, bw), np.int32)
    block_sel = np.zeros((bh, bw), np.int32)
    group_row = [0] * ((bw + 1) // 2)
    prev_ep = 0
    for by in range(bh):
        for bx in range(bw):
            if bx % 2 == 0 and by % 2 == 0:
                if g_huff is None:
                    raise ValueError("ETC1S: missing group-pred table")
                group_row[bx // 2] = g_huff.read(sl)
            slot = (by % 2) * 2 + (bx % 2)
            pred = (group_row[bx // 2] >> (slot * 2)) & 3
            if pred == _PRED_LEFT:
                if bx == 0:
                    raise ValueError("ETC1S: left-pred in column 0")
                ep = int(block_ep[by, bx - 1])
            elif pred == _PRED_ABOVE:
                if by == 0:
                    raise ValueError("ETC1S: above-pred in row 0")
                ep = int(block_ep[by - 1, bx])
            elif pred == _PRED_EXPLICIT:
                if d_huff is None:
                    raise ValueError("ETC1S: missing delta table")
                ep = (prev_ep + d_huff.read(sl)) % num_ep
            else:
                raise ValueError(
                    "ETC1S: prediction code 2 (history) is outside the "
                    "documented subset"
                )
            block_ep[by, bx] = ep
            prev_ep = ep
            if s_huff is None:
                raise ValueError("ETC1S: missing selector table")
            s = s_huff.read(sl)
            if s >= num_sel:
                raise ValueError("ETC1S: selector index out of range")
            block_sel[by, bx] = s

    out = np.zeros((bh * 4, bw * 4, 4), np.uint8)
    out[..., 3] = 255
    for by in range(bh):
        for bx in range(bw):
            r5, g5, b5, inten = endpoints[block_ep[by, bx]]
            base = np.array([(r5 << 3) | (r5 >> 2), (g5 << 3) | (g5 >> 2),
                             (b5 << 3) | (b5 >> 2)], np.int32)
            sel = selectors[block_sel[by, bx]]
            tbl = _INTEN[inten]
            for y in range(4):
                for x in range(4):
                    px = np.clip(base + tbl[sel[y * 4 + x]], 0, 255)
                    out[by * 4 + y, bx * 4 + x, :3] = px
    return out[:height, :width]
