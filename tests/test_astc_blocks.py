"""Block-level tests for the standard-ASTC parser (assets/astc.py).

Blocks are hand-assembled bit-by-bit from the spec layout, so these
vectors are independent of the parser's own bit bookkeeping.
"""

import numpy as np
import pytest

from madrona_renderer_tpu.assets import astc


def _build_block(bm: int, part_count: int, cem: int, ep_bytes: list[int],
                 weights2bit: list[int], seed: int = 0) -> bytes:
    """Assemble a 4x4 LDR block: block mode `bm` must select a 4x4 grid
    with 2-bit plain weights; endpoints are range-20 (8-bit) values."""
    v = bm
    v |= (part_count - 1) << 11
    if part_count == 1:
        v |= cem << 13
        pos = 17
    else:
        v |= seed << 13
        v |= (cem << 2) << 23  # shared-CEM encoding (low bits 00)
        pos = 29
    for b in ep_bytes:
        v |= b << pos
        pos += 8
    # weight stream: 16 x 2-bit plain ISE, LSB-first, then bit-reversed
    # into the top of the block.
    stream = 0
    for i, w in enumerate(weights2bit):
        stream |= (w & 3) << (2 * i)
    nbits = 2 * len(weights2bit)
    for i in range(nbits):
        if (stream >> i) & 1:
            v |= 1 << (127 - i)
    return v.to_bytes(16, "little")


# block mode 66: 4x4 weight grid, 2-bit plain weights, single plane
BM_4X4_W2 = 66


def test_blockmode_66_decodes_to_4x4_2bit():
    gw, gh, wrng, dual, _ = astc._decode_block_mode_2d(BM_4X4_W2)
    assert (gw, gh) == (4, 4)
    assert astc.wt_levels(wrng) == 4
    assert not dual


def test_single_partition_cem8_block():
    # endpoints: e0 = (10, 20, 30), e1 = (200, 210, 220) (s1 >= s0, no
    # blue-contract); weights cycle 0..3 -> 0, 21, 43, 64 / 64 blend.
    ep = [10, 200, 20, 210, 30, 220]
    w = [(i % 4) for i in range(16)]
    blk = _build_block(BM_4X4_W2, 1, 8, ep, w)
    out = astc.decode_astc_block(blk)
    uq = {0: 0, 1: 21, 2: 43, 3: 64}
    for t in range(16):
        exp = astc.interpolate_unorm8(
            (10, 20, 30, 255), (200, 210, 220, 255), uq[w[t]])
        assert tuple(out[t // 4, t % 4]) == exp


def test_single_partition_cem12_alpha():
    ep = [0, 255, 0, 255, 0, 255, 64, 192]
    w = [3] * 16
    blk = _build_block(BM_4X4_W2, 1, 12, ep, w)
    out = astc.decode_astc_block(blk)
    assert (out == [255, 255, 255, 192]).all()


def test_two_partition_shared_cem_uses_partition_hash():
    # Two subsets with contrasting solid colors; the texel assignment
    # must match select_partition exactly. With 2 subsets x CEM 8 only
    # 67 header bits remain, so the implicit endpoint range is 12
    # (40 levels, quint) — encode the endpoints through the real ISE.
    want = [40, 40, 40, 40, 40, 40,  # subset 0: solid gray
            220, 220, 0, 0, 220, 220]  # subset 1
    pairs = [astc.quantize_color(12, v) for v in want]
    got = [astc.unquant_color(12, d, m) for (d, m) in pairs]
    col0 = astc.decode_cem_ldr(8, got[:6])[0]
    col1 = astc.decode_cem_ldr(8, got[6:])[0]

    seed = 37
    v = BM_4X4_W2 | (1 << 11) | (seed << 13) | ((8 << 2) << 23)
    stream, nbits = astc._ise_encode(pairs, astc._EP_RANGES[12])
    v |= stream << 29
    assert 29 + nbits <= 128 - 32
    out = astc.decode_astc_block(v.to_bytes(16, "little"))  # weights all 0
    for y in range(4):
        for x in range(4):
            sub = astc.select_partition(seed, x, y, 2)
            exp = col0 if sub == 0 else col1
            assert tuple(out[y, x]) == exp


def test_void_extent_block():
    v = astc._VOID_EXTENT_2D | (0b11 << 10)  # reserved bits set
    # 13-bit extents: all-ones (unused-extent marker)
    for i in range(52):
        v |= 1 << (12 + i)
    # colors: UNORM16 RGBA at bits 64..127
    for c, col in enumerate([0x1234, 0x5678, 0x9ABC, 0xFFFF]):
        v |= col << (64 + 16 * c)
    out = astc.decode_astc_block(v.to_bytes(16, "little"))
    assert (out == [0x12, 0x56, 0x9A, 0xFF]).all()


def test_hdr_void_extent_gates():
    v = astc._VOID_EXTENT_2D | (1 << 9)
    with pytest.raises(NotImplementedError, match="HDR"):
        astc.decode_astc_block(v.to_bytes(16, "little"))


def test_cem1_luminance_base_offset():
    # v0=180, v1=214: L0 = (180>>2)|(214&0xC0) = 45|192 = 237;
    # L1 = min(237 + (214&0x3F)=22, 255) = 255 (clamped).
    blk = _build_block(BM_4X4_W2, 1, 1, [180, 214], [0, 3] * 8)
    out = astc.decode_astc_block(blk)
    assert (out[0, 0] == [237, 237, 237, 255]).all()
    assert (out[0, 1] == [255, 255, 255, 255]).all()


def test_cem5_luminance_alpha_base_offset():
    # lum: bts(10, 200) -> base (200>>1)|0 = 100, offset (10>>1)&63 = 5
    # alpha: bts(255, 100) -> base (100>>1)|128 = 178,
    #        offset (255>>1)&63 = 63 -> signed -1
    blk = _build_block(BM_4X4_W2, 1, 5, [200, 10, 100, 255], [0, 3] * 8)
    out = astc.decode_astc_block(blk)
    assert (out[0, 0] == [100, 100, 100, 178]).all()  # e0
    assert (out[0, 1] == [105, 105, 105, 177]).all()  # e1 = base+offset


def test_cem9_rgb_base_offset_positive_branch():
    # bases (200>>1, 100>>1, 50>>1) = (100, 50, 25); offsets
    # (10>>1, 20>>1, 30>>1) = (5, 10, 15), all positive -> no contract.
    blk = _build_block(BM_4X4_W2, 1, 9, [200, 10, 100, 20, 50, 30],
                       [0, 3] * 8)
    out = astc.decode_astc_block(blk)
    assert (out[0, 0] == [100, 50, 25, 255]).all()
    assert (out[0, 1] == [105, 60, 40, 255]).all()


def test_cem9_rgb_base_offset_blue_contract_swap():
    # offsets: r (130>>1)&63 = 1, g (131>>1)&63 = 1,
    # b (250>>1)&63 = 61 -> signed -3; sum = -1 < 0 -> blue-contract
    # branch: e0 = bc(base+offset), e1 = bc(base); bases gain the
    # offsets' MSBs: r (200>>1)|128 = 228, g (100>>1)|128 = 178,
    # b (50>>1)|128 = 153.
    blk = _build_block(BM_4X4_W2, 1, 9, [200, 130, 100, 131, 50, 250],
                       [0, 3] * 8)
    out = astc.decode_astc_block(blk)
    e0 = ((229 + 150) >> 1, (179 + 150) >> 1, 150, 255)
    e1 = ((228 + 153) >> 1, (178 + 153) >> 1, 153, 255)
    assert tuple(out[0, 0]) == e0
    assert tuple(out[0, 1]) == e1


def test_cem13_rgba_base_offset():
    # RGB part = the positive-branch CEM 9 vector; alpha bts(4, 60):
    # base (60>>1)|0 = 30, offset (4>>1)&63 = 2.
    blk = _build_block(BM_4X4_W2, 1, 13,
                       [200, 10, 100, 20, 50, 30, 60, 4], [0, 3] * 8)
    out = astc.decode_astc_block(blk)
    assert (out[0, 0] == [100, 50, 25, 30]).all()
    assert (out[0, 1] == [105, 60, 40, 32]).all()


def test_mixed_cem_two_partitions_decodes():
    """Mixed per-partition CEMs (spec C.2.11): partition 0 CEM 8 (class
    2), partition 1 CEM 13 (class 3) -> selector M=3, classes M-1+C_i;
    the encoded-type sequence spills 2 bits (partition 1's mode-low bit
    set) into the field directly below the weight data."""
    # S = [M0,M1, C0,C1, M0lo(2), M1lo(2)] = 1,1, 0,1, 00, 10
    cem_sel = 0b001011  # S0..S5: 1+2+8
    seed = 19
    n_ep_vals = 6 + 8
    # BM_4X4_W2: 32 weight bits; high part = 3*2-4 = 2 bits at
    # below_weights = 96-2 = 94; endpoint range: largest fitting
    # 94-29 = 65 bits for 14 values = range 10 (24 levels).
    ep_rng = 10
    want = [40, 41, 160, 161, 80, 81,          # CEM 8: rg/gb pairs
            200, 10, 100, 20, 50, 30, 60, 4]   # CEM 13 offset vector
    pairs = [astc.quantize_color(ep_rng, v) for v in want]
    stream, nbits = astc._ise_encode(pairs, astc._EP_RANGES[ep_rng])
    assert 29 + nbits <= 94
    v = BM_4X4_W2 | (1 << 11) | (seed << 13) | (cem_sel << 23)
    v |= stream << 29
    v |= 0b01 << 94  # S6=1 (CEM 13 mode-low bit 0), S7=0
    out = astc.decode_astc_block(v.to_bytes(16, "little"))  # weights 0
    got = [astc.unquant_color(ep_rng, d, m) for (d, m) in pairs]
    col0 = astc.decode_cem_ldr(8, got[:6])[0]
    col1 = astc.decode_cem_ldr(13, got[6:])[0]
    for y in range(4):
        for x in range(4):
            sub = astc.select_partition(seed, x, y, 2)
            assert tuple(out[y, x]) == (col0 if sub == 0 else col1)


def test_hdr_cem_gates():
    blk = _build_block(BM_4X4_W2, 1, 11, [0] * 6, [0] * 16)
    with pytest.raises(NotImplementedError, match="HDR"):
        astc.decode_astc_block(blk)


def test_oversized_weight_grid_rejected():
    # block mode selecting a grid wider than 4 texels must be rejected
    # for 4x4 blocks (spec: illegal encoding).
    bm = 66 | (1 << 7)  # B=1 -> gw=5
    blk = _build_block(bm, 1, 8, [0] * 6, [0] * 20)
    with pytest.raises(ValueError, match="exceeds"):
        astc.decode_astc_block(blk)


def test_infill_identity_at_full_grid():
    grid = [[(x * 7 + y * 13) % 65 for x in range(4)] for y in range(4)]
    assert astc._infill_weights(grid, 4, 4, 4, 4) == grid


def test_infill_2x2_corners_exact_and_monotone():
    grid = [[0, 64], [0, 64]]
    out = astc._infill_weights(grid, 2, 2, 4, 4)
    for row in out:
        assert row[0] == 0 and row[-1] == 64
        assert all(row[i] <= row[i + 1] for i in range(3))


def test_decode_astc_image_tiles_and_crops():
    ep = [10, 200, 20, 210, 30, 220]
    blk0 = _build_block(BM_4X4_W2, 1, 8, ep, [0] * 16)
    blk1 = _build_block(BM_4X4_W2, 1, 8, ep, [3] * 16)
    img = astc.decode_astc_image(blk0 + blk1, 7, 4)
    assert img.shape == (4, 7, 4)
    assert (img[:, :4] == [10, 20, 30, 255]).all()
    assert (img[:, 4:] == [200, 210, 220, 255]).all()
    with pytest.raises(ValueError, match="truncated"):
        astc.decode_astc_image(blk0, 7, 4)


def test_block_error_names_block_index():
    blk = _build_block(BM_4X4_W2, 1, 11, [0] * 6, [0] * 16)
    with pytest.raises(NotImplementedError, match="block 0"):
        astc.decode_astc_image(blk, 4, 4)
