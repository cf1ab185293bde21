"""Author-provided KTX2 mip levels flow into the bake verbatim
(libktx uploads file mips the same way — reference src/mgr.cpp:199-212).
"""

import numpy as np
import pytest

from madrona_renderer_tpu.assets.ktx2 import (
    MipChain,
    decode_ktx2,
    encode_ktx2_rgba8_mips,
)
from madrona_renderer_tpu.config import AdditionalMaterial
from madrona_renderer_tpu.core.scene import _mip_next, bake_scene


def _solid(h, w, rgba):
    img = np.zeros((h, w, 4), np.uint8)
    img[:] = rgba
    return img


def test_ktx2_multilevel_roundtrip():
    levels = [_solid(16, 16, [200, 10, 10, 255]),
              _solid(8, 8, [10, 200, 10, 255]),
              _solid(4, 4, [10, 10, 200, 255]),
              _solid(2, 2, [99, 99, 99, 255]),
              _solid(1, 1, [1, 2, 3, 255])]
    data = encode_ktx2_rgba8_mips(levels)
    base = decode_ktx2(data)
    np.testing.assert_array_equal(base, levels[0])
    chain = decode_ktx2(data, all_levels=True)
    assert isinstance(chain, MipChain)
    assert len(chain.levels) == 5
    for got, want in zip(chain.levels, levels):
        np.testing.assert_array_equal(got, want)


def test_single_level_stays_plain_array():
    img = _solid(8, 8, [5, 6, 7, 255])
    data = encode_ktx2_rgba8_mips([img])
    out = decode_ktx2(data, all_levels=True)
    assert isinstance(out, np.ndarray)


class _Assets:
    def __init__(self, textures):
        self.textures = textures
        self.materials = [AdditionalMaterial(color=(1, 1, 1, 1),
                                             texture_id=0)]
        self.objects = []
        self.meshes = [{
            "positions": np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                  np.float32),
            "indices": np.array([0, 1, 2], np.uint32),
            "uvs": np.array([[0, 0], [1, 0], [0, 1]], np.float32),
            "material": 0,
        }]


def _bake(tex_entry):
    from tests.helpers import build
    from madrona_renderer_tpu.config import ImportedCamera, ImportedInstance

    tri = np.array([[-1, 0, -1], [1, 0, -1], [0, 0, 1]], np.float32)
    state, scene = build(
        [tri],
        [ImportedInstance(position=[0, 3, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
        uvs=[np.array([[0, 0], [1, 0], [0, 1]], np.float32)],
        mesh_materials=[0],
        additional_mats=[AdditionalMaterial(color=(1, 1, 1, 1),
                                            texture_id=0)],
        texture_images=[tex_entry],
        mipmaps=True,
    )
    return scene


def test_provided_levels_used_verbatim():
    base = _solid(32, 32, [200, 10, 10, 255])
    # An authored level 1 that a box filter could never produce.
    custom = [base, _solid(16, 16, [10, 200, 10, 255])]
    sc_custom = _bake(MipChain(custom))
    sc_boxed = _bake(base)
    assert not np.array_equal(np.asarray(sc_custom.tex_data),
                              np.asarray(sc_boxed.tex_data))


def test_provided_levels_equal_box_chain_is_bitwise_noop():
    base = _solid(32, 32, [200, 10, 10, 255])
    chain = [base]
    while chain[-1].shape[0] > 1 or chain[-1].shape[1] > 1:
        chain.append(_mip_next(chain[-1]))
    sc_chain = _bake(MipChain(chain))
    sc_plain = _bake(base)
    np.testing.assert_array_equal(np.asarray(sc_chain.tex_data),
                                  np.asarray(sc_plain.tex_data))


def test_mismatched_level_dims_rejected():
    base = _solid(32, 32, [1, 2, 3, 255])
    bad = MipChain([base, _solid(9, 16, [0, 0, 0, 255])])
    with pytest.raises(ValueError, match="half"):
        _bake(bad)
