"""Invariant tests pinning the spec-derived ASTC LDR machinery.

The ASTC constants in assets/astc.py were written from the published
spec in a zero-egress sandbox (module docstring has the provenance
argument). These tests assert the invariants the spec guarantees *by
construction* — tight enough that a misremembered swizzle, multiplier,
or packing collapses multiple assertions at once.
"""

import numpy as np
import pytest

from madrona_renderer_tpu.assets import astc


def test_trit_packing_is_near_bijection():
    # 256 packed inputs must cover exactly the 3^5 canonical trit tuples.
    image = set(astc.TRIT_TABLE)
    assert len(image) == 3**5
    assert all(all(0 <= t <= 2 for t in tup) for tup in image)


def test_quint_packing_is_near_bijection():
    image = set(astc.QUINT_TABLE)
    assert len(image) == 5**3
    assert all(all(0 <= q <= 4 for q in tup) for tup in image)


def test_trit_encode_roundtrip():
    for t0 in range(3):
        for t1 in range(3):
            for t2 in range(3):
                for t3 in range(3):
                    for t4 in range(3):
                        tup = (t0, t1, t2, t3, t4)
                        assert astc.TRIT_TABLE[astc.TRIT_ENCODE[tup]] == tup


def test_quint_encode_roundtrip():
    for q0 in range(5):
        for q1 in range(5):
            for q2 in range(5):
                tup = (q0, q1, q2)
                assert astc.QUINT_TABLE[astc.QUINT_ENCODE[tup]] == tup


# Color quantization in ASTC starts at 6 levels (ranges 0-3 below 6
# levels exist only for weights; the trit/quint 0-bit color cases raise).
@pytest.mark.parametrize("rng", [0, 2] + list(range(4, 21)))
def test_color_unquant_range_invariants(rng):
    levels, nbits, trits, quints = astc._EP_RANGES[rng]
    vals = astc.color_levels(rng)
    uq = [v for (v, _, _) in vals]
    # exactly `levels` distinct values spanning 0..255
    assert len(uq) == levels
    assert len(set(uq)) == levels
    assert uq[0] == 0 and uq[-1] == 255
    # complement symmetry from the spec's XOR-by-A construction: for
    # trit/quint ranges flipping the `a` LSB complements the value; for
    # plain-bit ranges (replication) the full bit complement does.
    mask = (1 << nbits) - 1
    if nbits:
        for v, d, m in vals:
            flipped = (m ^ 1) if (trits or quints) else ((~m) & mask)
            assert astc.unquant_color(rng, d, flipped) == 255 - v


def test_color_unquant_zero_bit_tq_raises():
    for rng in (1, 3):
        with pytest.raises(NotImplementedError):
            astc.unquant_color(rng, 1, 0)


@pytest.mark.parametrize("rng", range(12))
def test_weight_unquant_range_invariants(rng):
    levels, nbits, trits, quints = astc._WT_RANGES[rng]
    vals = astc.weight_levels(rng)
    uq = [v for (v, _, _) in vals]
    assert len(uq) == levels
    assert len(set(uq)) == levels
    assert uq[0] == 0 and uq[-1] == 64
    mask = (1 << nbits) - 1
    if nbits:
        for v, d, m in vals:
            flipped = (m ^ 1) if (trits or quints) else ((~m) & mask)
            assert astc.unquant_weight(rng, d, flipped) == 64 - v
    else:
        # 0-bit trit/quint weights: d*32 / d*16 (spec special case)
        step = 32 if trits else 16
        for v, d, m in vals:
            assert v == d * step


def test_weight_unquant_known_bit_tables():
    # The plain-bit weight tables are small enough to state outright
    # (replicate-to-6-bits with the >32 correction).
    assert [astc.unquant_weight(0, 0, m) for m in range(2)] == [0, 64]
    assert [astc.unquant_weight(2, 0, m) for m in range(4)] == [0, 21, 43, 64]
    assert [astc.unquant_weight(5, 0, m) for m in range(8)] == [
        0, 9, 18, 27, 37, 46, 55, 64]


def test_color_unquant_plain_bits_are_replication():
    assert [astc.unquant_color(5, 0, m) for m in range(8)] == [
        0, 36, 73, 109, 146, 182, 219, 255]
    assert [astc.unquant_color(20, 0, m) for m in range(256)] == list(range(256))


def test_ise_roundtrip_bits_exact():
    # Decoding an ISE sequence must consume exactly the spec bit count,
    # for every range and count (full and partial trailing groups).
    for table, mk in ((astc._EP_RANGES, "ep"), (astc._WT_RANGES, "wt")):
        for cfg in table:
            _, nbits, trits, quints = cfg
            for count in (1, 2, 3, 4, 5, 6, 16, 18):
                nbits_total = astc.ise_sequence_bits(count, cfg)
                rng = np.random.RandomState(count * 31 + nbits)
                payload = rng.bytes((nbits_total + 7) // 8 + 2)
                r = astc.BitReader(payload)
                vals = astc._ise_decode(r, count, cfg)
                assert len(vals) == count
                assert r.pos == nbits_total, (mk, cfg, count)


def test_ise_zero_pad_semantics():
    # Trailing partial groups decode their digits from the truncated
    # packed bits with the missing high bits as zero: an all-zero stream
    # decodes every value to (0, 0).
    for cfg in astc._EP_RANGES:
        for count in (1, 2, 4, 7):
            r = astc.BitReader(b"\x00" * 32)
            vals = astc._ise_decode(r, count, cfg)
            assert all(v == (0, 0) for v in vals)


def test_partition_function_is_deterministic_and_in_range():
    for seed in range(0, 1024, 37):
        for pc in (2, 3):
            idx = [astc.select_partition(seed, x, y, pc)
                   for y in range(4) for x in range(4)]
            assert all(0 <= i < pc for i in idx)
            assert idx == [astc.select_partition(seed, x, y, pc)
                           for y in range(4) for x in range(4)]


def test_partition_function_produces_multiple_subsets():
    # Most seeds must split a 4x4 block into more than one subset —
    # a broken hash that returns a constant would fail this.
    n_multi = sum(
        len({astc.select_partition(seed, x, y, 2)
             for y in range(4) for x in range(4)}) > 1
        for seed in range(256)
    )
    assert n_multi > 128


def test_cem8_blue_contract_swap():
    # s1 < s0 triggers the swap + blue-contract on both endpoints.
    e0, e1 = astc.decode_cem_ldr(8, [200, 10, 200, 10, 200, 10])
    assert e0 == ((10 + 10) >> 1, (10 + 10) >> 1, 10, 255)
    assert e1 == ((200 + 200) >> 1, (200 + 200) >> 1, 200, 255)
    # s1 >= s0 keeps the direct order
    e0, e1 = astc.decode_cem_ldr(8, [10, 200, 10, 200, 10, 200])
    assert e0 == (10, 10, 10, 255) and e1 == (200, 200, 200, 255)


def test_interpolation_endpoints_exact():
    e0, e1 = (10, 20, 30, 40), (250, 240, 230, 220)
    assert astc.interpolate_unorm8(e0, e1, 0) == e0
    assert astc.interpolate_unorm8(e0, e1, 64) == e1
    mid = astc.interpolate_unorm8(e0, e1, 32)
    for c0, c1, m in zip(e0, e1, mid):
        assert min(c0, c1) <= m <= max(c0, c1)


def test_decode_block_solid_and_gradient():
    # Solid color via CEM 8 with equal endpoints.
    rng_ep = 20  # 8-bit direct
    ep = tuple((0, v) for v in (77, 77, 120, 120, 200, 200))
    blk = astc.ASTCBlockParams(
        cem=8, endpoint_range=rng_ep, weight_range=0,
        endpoints=(ep,), weights=tuple((0, 0) for _ in range(16)),
    )
    out = astc.decode_block_4x4(blk)
    assert (out == np.array([77, 120, 200, 255], np.uint8)).all()
    # A 1-bit weight gradient selects between the two endpoints exactly.
    blk2 = astc.ASTCBlockParams(
        cem=8, endpoint_range=rng_ep, weight_range=0,
        endpoints=(tuple((0, v) for v in (0, 255, 0, 255, 0, 255)),),
        weights=tuple((0, t % 2) for t in range(16)),
    )
    out2 = astc.decode_block_4x4(blk2)
    flat = out2.reshape(16, 4)
    assert (flat[::2] == [0, 0, 0, 255]).all()
    assert (flat[1::2] == [255, 255, 255, 255]).all()


def test_decode_block_dual_plane_overrides_one_channel():
    ep = (tuple((0, v) for v in (0, 255, 0, 255, 0, 255)),)
    w = []
    for t in range(16):
        w.append((0, 0))  # plane 0: weight 0 -> endpoint 0
        w.append((0, 1))  # plane 1: weight 1 -> endpoint 1
    blk = astc.ASTCBlockParams(
        cem=8, endpoint_range=20, weight_range=0,
        endpoints=ep, weights=tuple(w), dual_plane=True, ccs=2,
    )
    out = astc.decode_block_4x4(blk)
    assert (out[..., 0] == 0).all() and (out[..., 1] == 0).all()
    assert (out[..., 2] == 255).all()  # blue rides plane 1


def test_ise_encode_decode_roundtrip_random():
    rng = np.random.RandomState(7)
    for cfg in astc._EP_RANGES[4:] + astc._WT_RANGES:
        levels, nbits, trits, quints = cfg
        maxd = 2 if trits else (4 if quints else 0)
        for count in (1, 2, 3, 5, 6, 12, 16, 18):
            pairs = [(int(rng.randint(0, maxd + 1)),
                      int(rng.randint(0, 1 << nbits)))
                     for _ in range(count)]
            stream, nb = astc._ise_encode(pairs, cfg)
            assert nb == astc.ise_sequence_bits(count, cfg)
            r = astc.BitReader(stream.to_bytes((nb + 7) // 8 + 1, "little"))
            assert astc._ise_decode(r, count, cfg) == pairs
