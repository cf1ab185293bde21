"""UASTC machinery + standard-ASTC KTX2 tests (VERDICT r3 #2).

The UASTC tests drive assets/uastc.py end-to-end with the SYNTHETIC
layout table (tests/_fixtures/uastc_layout_synthetic.json) — proving
the machinery while the authoritative vendor table stays a loud,
narrow gate (see assets/uastc.py docstring).
"""

import json

import numpy as np
import pytest

from madrona_renderer_tpu.assets import astc, uastc
from madrona_renderer_tpu.assets.ktx2 import (
    decode_ktx2,
    encode_ktx2_payload,
)

from tests.fixtures import ensure_uastc_layout

LAYOUT_PATH = ensure_uastc_layout()


@pytest.fixture
def layout():
    return uastc.load_layout(LAYOUT_PATH)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_gate_without_layout(monkeypatch, rng):
    monkeypatch.delenv("MRT_UASTC_LAYOUT", raising=False)
    img = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    payload = b"\x00" * 16
    with pytest.raises(NotImplementedError, match="MRT_UASTC_LAYOUT"):
        uastc.decode_uastc_image(payload, 4, 4)
    del img


def test_layout_prefix_code_validation():
    with pytest.raises(ValueError, match="prefix"):
        uastc.UASTCLayout((
            uastc.UASTCMode(0, code=1, code_len=4, kind="astc"),
            uastc.UASTCMode(1, code=0b10001, code_len=5, kind="astc"),
        ))
    with pytest.raises(ValueError, match="duplicate"):
        uastc.UASTCLayout((
            uastc.UASTCMode(0, code=1, code_len=4, kind="astc"),
            uastc.UASTCMode(1, code=1, code_len=4, kind="astc"),
        ))


def test_solid_block_roundtrip(layout):
    blk = (0).to_bytes(2, "little")  # code 0 len 5 = solid mode
    v = 0
    for i, c in enumerate([11, 22, 33, 244]):
        v |= c << (5 + 8 * i)
    out = uastc.decode_uastc_block(v.to_bytes(16, "little"), layout)
    assert (out == [11, 22, 33, 244]).all()
    del blk


def test_encode_decode_solid_colors_exact(layout):
    # Solid-color blocks survive the fixture encoder exactly at the
    # quantized levels (min == max endpoints).
    img = np.zeros((8, 8, 4), np.uint8)
    img[:4, :4] = [10, 60, 110, 255]
    img[:4, 4:] = [200, 150, 100, 255]
    img[4:, :4] = [0, 0, 0, 255]
    img[4:, 4:] = [255, 255, 255, 255]
    payload = uastc.encode_uastc_image(img, layout)
    out = uastc.decode_uastc_image(payload, 8, 8, layout)
    # mode 0: RGB endpoint range 19 (192 levels)
    for y, x in [(0, 0), (0, 4), (4, 0), (4, 4)]:
        want = [
            astc.unquant_color(19, *astc.quantize_color(19, int(c)))
            for c in img[y, x][:3]
        ] + [255]
        assert (out[y:y + 4, x:x + 4] == np.array(want, np.uint8)).all()


def test_encode_decode_gradient_close(layout):
    # A smooth per-block gradient codes well in any 2-endpoint block
    # format: the fixture encoder must land close.
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., 0] = (xx * 255 // 15).astype(np.uint8)
    img[..., 1] = (yy * 255 // 15).astype(np.uint8)
    img[..., 2] = 90
    img[..., 3] = 255
    payload = uastc.encode_uastc_image(img, layout)
    out = uastc.decode_uastc_image(payload, 16, 16, layout)
    err = np.abs(out[..., :3].astype(int) - img[..., :3].astype(int))
    assert err.mean() < 12
    assert (out[..., 3] == 255).all()


def test_unknown_mode_code_fails_loudly(layout):
    # low bits 0b01111... wait: craft bits matching no code: all codes
    # are {1,len4} and {0,3,7,15,31 len5}; low 5 bits = 0b00101 (5) has
    # low4 = 0101 != 1 and 5 not in the len-5 set.
    v = 0b00101
    with pytest.raises(ValueError, match="match no mode"):
        uastc.decode_uastc_block(v.to_bytes(16, "little"), layout)


def test_pattern_index_out_of_table_fails(layout):
    # mode 2: code 31 len 5, hint_bits 3, pattern_bits 5; pattern 31
    # exceeds the 30-entry seed table.
    v = 31 | (0 << 5) | (31 << 8)
    with pytest.raises(ValueError, match="seed table"):
        uastc.decode_uastc_block(v.to_bytes(16, "little"), layout)


def test_truncated_payload_fails(layout):
    with pytest.raises(ValueError, match="truncated"):
        uastc.decode_uastc_image(b"\x00" * 15, 4, 4, layout)


def test_dual_plane_mode_decodes(layout):
    # mode 6: code 15 len 5, CEM 8, ep range 18, 2-bit weights, 2 planes.
    ep_cfg = astc._EP_RANGES[18]
    pairs = [astc.quantize_color(18, c) for c in
             [0, 255, 0, 255, 0, 255]]
    ep_stream, ep_bits = astc._ise_encode(pairs, ep_cfg)
    v = 15 | (1 << 5) | (0 << 6)  # ccs = 1 (green rides plane 2)
    pos = 7
    v |= ep_stream << pos
    pos += ep_bits
    # plane-0 weight 0, plane-1 weight 3 for every texel
    wt_pairs = []
    for _ in range(16):
        wt_pairs += [(0, 0), (0, 3)]
    w_stream, w_bits = astc._ise_encode(wt_pairs, astc._WT_RANGES[2])
    v |= w_stream << pos
    pos += w_bits
    assert pos <= 128
    out = uastc.decode_uastc_block(v.to_bytes(16, "little"), layout)
    assert (out[..., 0] == 0).all()
    assert (out[..., 1] == 255).all()  # plane 2 drives green
    assert (out[..., 2] == 0).all()


def test_two_subset_mode_uses_seed_table(layout):
    mode = next(m for m in layout.modes if m.subsets == 2)
    pat = 4
    seed = mode.pattern_seeds[pat]
    ep_cfg = astc._EP_RANGES[mode.endpoint_range]
    want = [30, 30, 30, 30, 30, 30, 240, 240, 240, 240, 240, 240]
    pairs = [astc.quantize_color(mode.endpoint_range, c) for c in want]
    got = [astc.unquant_color(mode.endpoint_range, d, m) for d, m in pairs]
    col0 = astc.decode_cem_ldr(8, got[:6])[0]
    col1 = astc.decode_cem_ldr(8, got[6:])[0]
    ep_stream, ep_bits = astc._ise_encode(pairs, ep_cfg)
    v = mode.code | (0 << 5) | (pat << (mode.code_len + mode.hint_bits))
    pos = mode.code_len + mode.hint_bits + mode.pattern_bits
    v |= ep_stream << pos
    pos += ep_bits
    w_stream, w_bits = astc._ise_encode([(0, 0)] * 16,
                                        astc._WT_RANGES[mode.weight_range])
    v |= w_stream << pos
    assert pos + w_bits <= 128
    out = uastc.decode_uastc_block(v.to_bytes(16, "little"), layout)
    for y in range(4):
        for x in range(4):
            sub = astc.select_partition(seed, x, y, 2)
            assert tuple(out[y, x]) == (col0 if sub == 0 else col1)


def test_uastc_ktx2_end_to_end(layout, rng, monkeypatch, tmp_path):
    img = np.zeros((12, 12, 4), np.uint8)
    img[..., 0] = np.linspace(0, 255, 12).astype(np.uint8)[None, :]
    img[..., 2] = 160
    img[..., 3] = 255
    payload = uastc.encode_uastc_image(img, layout)
    ktx = encode_ktx2_payload(payload, 12, 12, vk_format=0)
    # without the env var: loud gate
    monkeypatch.delenv("MRT_UASTC_LAYOUT", raising=False)
    with pytest.raises(NotImplementedError, match="MRT_UASTC_LAYOUT"):
        decode_ktx2(ktx)
    # with it: decodes through the standard KTX2 entry point
    monkeypatch.setenv("MRT_UASTC_LAYOUT", LAYOUT_PATH)
    out = decode_ktx2(ktx)
    assert out.shape == (12, 12, 4)
    err = np.abs(out[..., :3].astype(int) - img[..., :3].astype(int))
    assert err.mean() < 24


def test_uastc_fixture_renders(layout, monkeypatch, tmp_path):
    """VERDICT r3 #2 'Done' condition: a UASTC fixture decodes and
    renders, and renders IDENTICALLY to the same texels via PNG (the
    container/codec is a pure input-path difference)."""
    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial, ImportedInstance
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_ref
    from tests.helpers import build, cam_at_origin_looking_plus_y, quad_uvs, quad_xz

    img = np.zeros((16, 16, 4), np.uint8)
    img[:8, :8] = [255, 40, 40, 255]
    img[8:, 8:] = [255, 40, 40, 255]
    img[:8, 8:] = [40, 40, 255, 255]
    img[8:, :8] = [40, 40, 255, 255]
    payload = uastc.encode_uastc_image(img, layout)
    ktx_path = tmp_path / "checker_uastc.ktx2"
    ktx_path.write_bytes(encode_ktx2_payload(payload, 16, 16, vk_format=0))
    monkeypatch.setenv("MRT_UASTC_LAYOUT", LAYOUT_PATH)

    def render(tex_path):
        state, scene = build(
            [quad_xz(half=100.0, y=0.0)],
            [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                              scale=[1, 1, 1], object_id=0)],
            [cam_at_origin_looking_plus_y()],
            uvs=[quad_uvs()],
            mesh_materials=[0],
            additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1),
                                                texture_id=0)],
            additional_textures=[tex_path],
        )
        return rt_ref(state, scene, height=32, width=32)

    frames = render(str(ktx_path))
    assert (np.asarray(frames.segmask) >= 0).any(), "quad not visible"
    decoded = decode_ktx2(ktx_path.read_bytes())
    png_path = str(tmp_path / "checker_uastc.png")
    write_png(png_path, decoded)
    frames2 = render(png_path)
    np.testing.assert_array_equal(np.asarray(frames.rgb),
                                  np.asarray(frames2.rgb))


# --- standard-ASTC KTX2 ----------------------------------------------------


def test_astc_ktx2_end_to_end():
    yy, xx = np.mgrid[0:20, 0:20]
    img = np.zeros((20, 20, 4), np.uint8)
    img[..., 0] = (xx * 255 // 19).astype(np.uint8)
    img[..., 1] = (yy * 255 // 19).astype(np.uint8)
    img[..., 2] = 140
    img[..., 3] = 255
    payload = astc.encode_astc_image(img)
    ktx = encode_ktx2_payload(payload, 20, 20, vk_format=157)
    out = decode_ktx2(ktx)
    assert out.shape == (20, 20, 4)
    err = np.abs(out[..., :3].astype(int) - img[..., :3].astype(int))
    assert err.mean() < 12


def test_astc_ktx2_alpha_blocks_use_cem12():
    yy, xx = np.mgrid[0:8, 0:8]
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200
    img[..., 1] = (xx * 255 // 7).astype(np.uint8)
    img[..., 2] = 60
    img[..., 3] = (yy * 255 // 7).astype(np.uint8)  # varying alpha
    payload = astc.encode_astc_image(img)
    ktx = encode_ktx2_payload(payload, 8, 8, vk_format=157)
    out = decode_ktx2(ktx)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 24
    assert len(np.unique(out[..., 3])) > 1  # alpha survived (CEM 12)


def test_astc_ktx2_srgb_variant_decodes(rng):
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    img[..., 3] = 255
    payload = astc.encode_astc_image(img)
    out = decode_ktx2(encode_ktx2_payload(payload, 8, 8, vk_format=158))
    assert out.shape == (8, 8, 4)


def test_astc_ktx2_fixture_renders(tmp_path):
    """An ASTC-compressed KTX2 texture loads and renders, identically to
    its decoded texels delivered as PNG."""
    from madrona_renderer_tpu.assets.png import write_png
    from madrona_renderer_tpu.config import AdditionalMaterial, ImportedInstance
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace as rt_ref
    from tests.helpers import build, cam_at_origin_looking_plus_y, quad_uvs, quad_xz

    img = np.zeros((16, 16, 4), np.uint8)
    img[:, :8] = [20, 220, 20, 255]
    img[:, 8:] = [220, 20, 220, 255]
    payload = astc.encode_astc_image(img)
    ktx_path = tmp_path / "astc_tex.ktx2"
    ktx_path.write_bytes(encode_ktx2_payload(payload, 16, 16, 157))

    def render(tex_path):
        state, scene = build(
            [quad_xz(half=100.0, y=0.0)],
            [ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0],
                              scale=[1, 1, 1], object_id=0)],
            [cam_at_origin_looking_plus_y()],
            uvs=[quad_uvs()],
            mesh_materials=[0],
            additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1),
                                                texture_id=0)],
            additional_textures=[tex_path],
        )
        return rt_ref(state, scene, height=32, width=32)

    frames = render(str(ktx_path))
    assert (np.asarray(frames.segmask) >= 0).any(), "quad not visible"
    decoded = decode_ktx2(ktx_path.read_bytes())
    png_path = str(tmp_path / "astc_tex.png")
    write_png(png_path, decoded)
    frames2 = render(png_path)
    np.testing.assert_array_equal(np.asarray(frames.rgb),
                                  np.asarray(frames2.rgb))


def test_astc_solid_blocks_exact():
    img = np.zeros((4, 8, 4), np.uint8)
    img[:, :4] = [1, 2, 3, 255]
    img[:, 4:] = [250, 251, 252, 255]
    payload = astc.encode_astc_image(img)
    out = decode_ktx2(encode_ktx2_payload(payload, 8, 4, vk_format=157))
    # solid blocks: min == max endpoints; range-20 endpoints are exact
    np.testing.assert_array_equal(out[:4, :8], img)


def test_synthetic_layout_is_marked():
    with open(LAYOUT_PATH) as f:
        raw = json.load(f)
    assert "SYNTHETIC" in raw["_comment"]


def test_hostile_astc_containers_fail_cleanly(rng):
    """Byte-mutated ASTC/UASTC KTX2 containers must decode or raise a
    clean ValueError/NotImplementedError — never crash or hang."""
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    img[..., 3] = 255
    base = bytearray(encode_ktx2_payload(astc.encode_astc_image(img),
                                         8, 8, vk_format=157))
    for trial in range(200):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            data[int(rng.integers(len(data)))] ^= int(rng.integers(1, 256))
        try:
            out = decode_ktx2(bytes(data))
            assert out.shape[-1] == 4
        except (ValueError, NotImplementedError, KeyError):
            pass
    for cut in range(0, len(base), 11):
        try:
            decode_ktx2(bytes(base[:cut]))
        except (ValueError, NotImplementedError):
            pass
