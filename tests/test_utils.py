"""Viewer, profiling, checkpoint tests."""

import os

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from madrona_renderer_tpu.config import RenderMode
from madrona_renderer_tpu.manager import Manager
from madrona_renderer_tpu.runners.scenes import demo_config
from madrona_renderer_tpu.runners.viewer import Viewer, parse_viewer_args
from madrona_renderer_tpu.utils.checkpoint import load_state, save_state
from madrona_renderer_tpu.utils.profiling import PhaseTimer, trace


@pytest.fixture(scope="module")
def mgr():
    return Manager(demo_config(3, RenderMode.Raytracer, 16, 16, dynamic=True))


def test_viewer_navigation_and_images(mgr):
    v = Viewer(mgr)
    img = v.current_image()
    assert img.shape == (16, 16, 4) and img.dtype == np.uint8
    assert v.handle_key("right") and v.world == 1
    assert v.handle_key("left") and v.world == 0
    assert v.handle_key("left") and v.world == 2  # wraps
    v.handle_key("d")
    assert v.show_depth and v.current_image().shape == (16, 16, 4)
    v.handle_key(" ")
    assert v.paused
    t0 = float(np.asarray(mgr.state.time)[0])
    v.tick()  # paused: no step
    assert float(np.asarray(mgr.state.time)[0]) == t0
    v.handle_key(" ")
    v.tick()
    assert float(np.asarray(mgr.state.time)[0]) > t0
    assert not v.handle_key("q")


def test_viewer_args_contract():
    n, mode, bw, bh, ssaa = parse_viewer_args(
        ["v", "4", "rt", "800", "600", "64", "32"])
    assert (n, mode, bw, bh, ssaa) == (4, RenderMode.Raytracer, 64, 32, 1)
    *_, ssaa = parse_viewer_args(
        ["v", "4", "rt", "800", "600", "64", "32", "--ssaa", "2"])
    assert ssaa == 2
    with pytest.raises(SystemExit):
        parse_viewer_args(["v", "4", "rt"])
    with pytest.raises(SystemExit):
        parse_viewer_args(["v", "4", "rt", "800", "600", "64", "32", "--bogus"])


def test_checkpoint_roundtrip(mgr, tmp_path):
    path = str(tmp_path / "state.npz")
    save_state(path, mgr.state)
    loaded = load_state(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.instance_pos), np.asarray(mgr.state.instance_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.time), np.asarray(mgr.state.time)
    )
    # Loaded state renders identically.
    f1 = mgr.render_state(loaded)
    f2 = mgr.render_state(mgr.state)
    np.testing.assert_array_equal(np.asarray(f1.rgb), np.asarray(f2.rgb))


def test_phase_timer(mgr):
    timer = PhaseTimer()
    with timer.phase("step", sync_on=None):
        mgr.step()
    assert timer.counts["step"] == 1
    assert "step" in timer.report()


def test_trace_writes_profile(tmp_path, mgr):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        mgr.step()
    # jax writes plugins/profile/<ts>/*.trace.json.gz under the logdir
    found = []
    for root, _, files in os.walk(logdir):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, "no trace artifacts written"


def test_trace_noop_without_logdir(mgr):
    with trace(None):
        mgr.step()  # must not raise


def test_checkpoint_suffixless_path(mgr, tmp_path):
    """ADVICE r1 (low): save/load must agree on '.npz' suffix handling."""
    path = str(tmp_path / "state")  # no suffix
    save_state(path, mgr.state)
    loaded = load_state(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.instance_pos), np.asarray(mgr.state.instance_pos)
    )


def test_checkpoint_loads_pre_fov_field_files(tmp_path):
    """Checkpoints written before SimState gained camera_fov/camera_znear
    must still load (defaulting the new fields to 0 = inherit)."""
    import dataclasses

    import numpy as np

    from madrona_renderer_tpu.core.state import SimState
    from madrona_renderer_tpu.utils.checkpoint import load_state, save_state
    from madrona_renderer_tpu.runners.scenes import demo_config
    from madrona_renderer_tpu.core.state import init_state

    cfg = demo_config(2, __import__("madrona_renderer_tpu").RenderMode.Raytracer, 8, 8)
    state = init_state(cfg.rcfg.instances, cfg.rcfg.cameras, cfg.rcfg.worlds)
    path = str(tmp_path / "old_ckpt")
    save_state(path, state)
    # Rewrite the file without the per-camera fov/znear fields (an
    # old-format checkpoint).
    with np.load(path + ".npz") as data:
        arrays = {k: data[k] for k in data.files}
    arrays.pop("camera_fov")
    arrays.pop("camera_znear")
    np.savez(path, **arrays)
    loaded = load_state(path)
    assert np.asarray(loaded.camera_fov).shape == np.asarray(state.camera_fov).shape
    assert (np.asarray(loaded.camera_fov) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(loaded.instance_pos), np.asarray(state.instance_pos)
    )
    # A checkpoint missing a core field errs clearly.
    arrays.pop("instance_pos")
    np.savez(path, **arrays)
    with pytest.raises(ValueError, match="instance_pos"):
        load_state(path)


def test_training_checkpoint_roundtrip(mgr, tmp_path):
    """Full-training-pytree checkpoint (params + opt_state + SimState)
    through the orbax tier — the nested case npz can't express."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    from madrona_renderer_tpu.rl.ppo import PPOConfig, init_policy_params
    from madrona_renderer_tpu.utils.checkpoint import (
        load_training_checkpoint,
        save_training_checkpoint,
    )

    cfg = PPOConfig(height=8, width=8)
    params = init_policy_params(cfg, jax.random.PRNGKey(0))
    tree = {"params": params, "sim_state": mgr.state, "step": 7}
    path = str(tmp_path / "train_ckpt")
    save_training_checkpoint(path, tree)
    got = load_training_checkpoint(path, template=tree)
    assert int(np.asarray(got["step"])) == 7
    np.testing.assert_array_equal(
        np.asarray(got["sim_state"].instance_pos),
        np.asarray(mgr.state.instance_pos),
    )
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(got["params"][k]), np.asarray(params[k])
        )
