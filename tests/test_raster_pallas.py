"""raster_pallas ↔ raster_ref parity."""

import numpy as np

from madrona_renderer_tpu.config import ImportedInstance
from madrona_renderer_tpu.ops.raster_pallas import rasterize as rast_pal
from madrona_renderer_tpu.ops.raster_ref import rasterize as rast_ref

from tests.helpers import build, cam_at_origin_looking_plus_y, quad_xz


def test_raster_pallas_parity():
    state, scene = build(
        [quad_xz(half=3.0, y=0.0)],
        [
            ImportedInstance(position=[0, 10, 0], rotation=[1, 0, 0, 0], scale=[1, 1, 1], object_id=0),
            ImportedInstance(position=[1.5, 6, 1.0], rotation=[1, 0, 0, 0], scale=[0.4, 1, 0.4], object_id=0),
        ],
        [cam_at_origin_looking_plus_y()],
    )
    a = rast_ref(state, scene, height=32, width=32)
    b = rast_pal(state, scene, height=32, width=32, interpret=True)
    diff = np.abs(
        np.asarray(a.rgb).astype(np.int16) - np.asarray(b.rgb).astype(np.int16)
    )
    assert diff.max() <= 1, f"rgb diff {diff.max()}"
    np.testing.assert_allclose(
        np.asarray(a.depth), np.asarray(b.depth), rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(b.segmask) == -1).all()
