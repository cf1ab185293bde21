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
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert cc._REPO_DIR == os.path.join(repo_root, ".cache", "mrt_xla_cache")
    # The env override wins when set at import; either way DEFAULT_DIR
    # must not live under /tmp.
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
