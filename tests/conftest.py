"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

This is the standard JAX answer to testing TPU sharding without a TPU pod:
``--xla_force_host_platform_device_count=8`` fakes 8 devices on the host CPU
so ``jax.sharding.Mesh`` / ``pjit`` paths execute real collectives. The same
code runs unmodified on real TPU meshes. (The reference has no test
infrastructure at all — a single eyeball-verified matplotlib script,
``scripts/test.py``; see SURVEY.md §4.)
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag
# wins. Must run before any jax.devices() call.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def data_dir():
    """Synthesized mesh fixtures equivalent to the reference's data/ dir."""
    from tests.fixtures import ensure_fixtures

    return ensure_fixtures()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
