"""Compile-cache opt-in behavior (utils/compile_cache.py).

The cache must default to a repo-local dir (sandbox VM reboots wipe
/tmp — r4 paid two 15-min cold terrain recompiles for that), never
activate on the CPU backend (XLA:CPU AOT machine-feature mismatch can
SIGILL), and honor MRT_COMPILE_CACHE=0. No reference analog
(src/mgr.cpp compiles its megakernel per-process via NVRTC).
"""

import os

from madrona_renderer_tpu.utils import compile_cache as cc


def test_default_dir_is_repo_local():
    # Derive the expected root from the PACKAGE location (not this test
    # file) so the assertion also holds under an installed-package
    # layout (ADVICE r4).
    import madrona_renderer_tpu as pkg

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    assert cc._REPO_DIR == os.path.join(pkg_root, ".cache", "mrt_xla_cache")
    assert not cc._REPO_DIR.startswith("/tmp")
    # The env override wins when set at import (and may legitimately
    # point anywhere, including /tmp); only pin the no-override case.
    if "MRT_CACHE_DIR" not in os.environ:
        assert cc.DEFAULT_DIR == cc._REPO_DIR
        assert not cc.DEFAULT_DIR.startswith("/tmp")


def test_cpu_backend_never_caches():
    # conftest forces the CPU platform for the suite.
    assert cc.enable() is False


def test_knob_disables(monkeypatch):
    monkeypatch.setenv("MRT_COMPILE_CACHE", "0")
    assert cc.enable() is False


def test_writable_probe(tmp_path):
    assert cc._writable(str(tmp_path / "sub")) is True
    assert cc._writable("/proc/definitely/not/writable") is False
