"""Manager with num_devices>1: the OO API itself runs worlds-sharded."""

import jax
import numpy as np
import pytest

import madrona_renderer_tpu as m
from madrona_renderer_tpu.config import RenderMode
from madrona_renderer_tpu.manager import Manager
from madrona_renderer_tpu.runners.scenes import demo_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_manager_8dev_matches_single():
    single = Manager(demo_config(8, RenderMode.Raytracer, 16, 16, dynamic=True))
    multi = Manager(
        demo_config(8, RenderMode.Raytracer, 16, 16, dynamic=True, num_devices=8)
    )
    np.testing.assert_array_equal(
        single.rgb_tensor().numpy(), multi.rgb_tensor().numpy()
    )
    # State sharded over 8 devices.
    assert len(multi.state.instance_pos.sharding.device_set) == 8


def test_manager_multidevice_mutation_contract():
    mgr = Manager(
        demo_config(8, RenderMode.Raytracer, 16, 16, dynamic=True, num_devices=8)
    )
    before = mgr.rgb_tensor().numpy().copy()
    pos = mgr.instance_position_tensor().numpy()
    pos[0][2] += 4.0  # world 0's cube
    mgr.step()
    after = mgr.rgb_tensor().numpy()
    assert (after[0] != before[0]).any()
    assert (after[1] == before[1]).all()


def test_manager_indivisible_worlds_raises():
    with pytest.raises(ValueError, match="not divisible"):
        Manager(demo_config(6, RenderMode.Raytracer, 16, 16, num_devices=8))


def test_manager_8dev_ssaa_matches_single():
    """ssaa=2 under worlds-sharding: the supersampled render + box filter
    is elementwise over worlds, so the 8-device output bitwise-matches
    single-device (ops/ssaa.py under GSPMD)."""
    single = Manager(
        demo_config(8, RenderMode.Raytracer, 16, 16, dynamic=True, ssaa=2))
    multi = Manager(
        demo_config(8, RenderMode.Raytracer, 16, 16, dynamic=True, ssaa=2,
                    num_devices=8))
    np.testing.assert_array_equal(
        single.rgb_tensor().numpy(), multi.rgb_tensor().numpy())
    np.testing.assert_array_equal(
        single.depth_tensor().numpy(), multi.depth_tensor().numpy())
