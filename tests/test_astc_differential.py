"""Differential fuzz: native/astc.cpp vs assets/astc.py.

Two independent transcriptions of the spec-derived ASTC machinery must
agree bitwise on every input — valid fixture payloads, hand-assembled
structured blocks, and random/mutated blocks (where both accept)."""

import numpy as np
import pytest

from madrona_renderer_tpu.assets import astc
from madrona_renderer_tpu.native import available, decode_astc_native

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable"
)


def _both(payload, w, h, bw=4, bh=4, srgb=False):
    try:
        a = astc.decode_astc_image(payload, w, h, bw, bh, srgb)
        a_ok = True
    except (ValueError, NotImplementedError):
        a, a_ok = None, False
    try:
        b = decode_astc_native(payload, w, h, bw, bh, srgb)
        b_ok = True
    except (ValueError, NotImplementedError):
        b, b_ok = None, False
    return a, a_ok, b, b_ok


def test_fixture_payloads_bitwise_identical():
    rng = np.random.default_rng(5)
    for shape in [(16, 16), (20, 12), (4, 4), (32, 8)]:
        img = rng.integers(0, 256, size=shape + (4,), dtype=np.uint8)
        payload = astc.encode_astc_image(img)
        a, a_ok, b, b_ok = _both(payload, shape[1], shape[0])
        assert a_ok and b_ok
        assert (a == b).all()


def test_structured_blocks_bitwise_identical():
    # void extent
    v = astc._VOID_EXTENT_2D | (0b11 << 10)
    for c, col in enumerate([0x1234, 0x5678, 0x9ABC, 0xFFFF]):
        v |= col << (64 + 16 * c)
    blk = v.to_bytes(16, "little")
    a, a_ok, b, b_ok = _both(blk, 4, 4)
    assert a_ok and b_ok and (a == b).all()
    # two-partition shared CEM (same construction as test_astc_blocks)
    want = [40, 40, 40, 40, 40, 40, 220, 220, 0, 0, 220, 220]
    pairs = [astc.quantize_color(12, x) for x in want]
    stream, _ = astc._ise_encode(pairs, astc._EP_RANGES[12])
    v = 66 | (1 << 11) | (37 << 13) | ((8 << 2) << 23) | (stream << 29)
    a, a_ok, b, b_ok = _both(v.to_bytes(16, "little"), 4, 4)
    assert a_ok and b_ok and (a == b).all()


def test_random_blocks_no_silent_divergence():
    rng = np.random.default_rng(11)
    both_ok = 0
    diverged = []
    one_sided = []

    def try_block(blk, trial):
        nonlocal both_ok
        a, a_ok, b, b_ok = _both(blk, 4, 4)
        if a_ok and b_ok:
            both_ok += 1
            if not (a == b).all():
                diverged.append(trial)
        elif a_ok != b_ok:
            one_sided.append(trial)

    # pure-random blocks (mostly rejected — reserved modes, illegal
    # weight streams; the accept/reject LINE must still agree)...
    for trial in range(600):
        try_block(rng.bytes(16), trial)
    # ...plus valid-block-mode-prefixed random blocks for decode-path
    # coverage (bm 66 = 4x4/2-bit; random partitions, CEM, payload).
    for trial in range(400):
        v = int.from_bytes(rng.bytes(16), "little")
        v = (v & ~0x7FF) | 66
        try_block(v.to_bytes(16, "little"), 1000 + trial)
    assert not diverged, f"{len(diverged)} both-accept divergences"
    # The two transcriptions must also draw the SAME accept/reject line:
    # both implement the same explicit structural gates.
    assert not one_sided, f"{len(one_sided)} one-sided accepts"
    assert both_ok > 50, f"only {both_ok} blocks accepted by both"


def test_mutated_fixture_payloads_agree():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    payload = bytearray(astc.encode_astc_image(img))
    for trial in range(300):
        p = bytearray(payload)
        for _ in range(int(rng.integers(1, 4))):
            p[int(rng.integers(len(p)))] ^= int(rng.integers(1, 256))
        a, a_ok, b, b_ok = _both(bytes(p), 8, 8)
        assert a_ok == b_ok, f"trial {trial}: accept/reject disagreement"
        if a_ok:
            assert (a == b).all(), f"trial {trial}: decoded differently"


def test_other_block_footprints_agree():
    # 6x6 and 8x8 block footprints through both decoders (void-extent
    # and gradient content via per-block solid colors).
    rng = np.random.default_rng(17)
    for bw, bh in [(5, 4), (6, 6), (8, 8), (12, 12)]:
        blocks = b""
        for _ in range(4):
            v = astc._VOID_EXTENT_2D | (0b11 << 10)
            for c in range(4):
                v |= int(rng.integers(0, 1 << 16)) << (64 + 16 * c)
            blocks += v.to_bytes(16, "little")
        w = bw * 2 - 1
        h = bh * 2 - 1
        a, a_ok, b, b_ok = _both(blocks, w, h, bw, bh)
        assert a_ok and b_ok and (a == b).all()
