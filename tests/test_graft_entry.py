"""Regression tests for the driver entry points in ``__graft_entry__.py``.

Round-1 post-mortem (VERDICT.md weak #1): the driver imports the module and
calls ``dryrun_multichip(8)`` directly — no env setup, jax possibly already
initialized on a 1-device platform — and the round-1 entry point only
provisioned the 8-device CPU platform in its ``__main__`` block, so the
driver's invocation crashed. These tests reproduce the driver's exact
invocation: a fresh subprocess whose env carries NO jax/XLA configuration,
doing nothing but importing the module and calling the function.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The driver's env: no XLA device-count flags, no platform forcing."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_MRT_DRYRUN_INPROC")
    }
    return env


def test_dryrun_multichip_driver_invocation():
    # Exactly what the driver runs: import the module, call the function.
    # The parent process must not need jax at all (dryrun_multichip
    # self-provisions a virtual 8-device CPU mesh in a subprocess).
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, (
        f"driver-style dryrun_multichip(8) failed:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_make_mesh_insufficient_devices_error():
    from madrona_renderer_tpu.parallel.mesh import make_mesh

    import jax

    n_have = len(jax.devices())
    with pytest.raises(ValueError, match=f"needs {n_have * 2} devices"):
        make_mesh(n_have * 2, 1)
