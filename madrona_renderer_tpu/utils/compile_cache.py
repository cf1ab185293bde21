"""Persistent XLA compilation-cache opt-in for tools and benches.

The measurement chains launch fresh short-lived TPU clients (single-
client tunnel discipline, CLAUDE.md), and every fresh process pays the
full XLA compile again — measured at 80 s on an idle host and up to
15 min for one terrain config on a loaded one. The persistent cache
makes repeat probes start in seconds; executables are bit-identical so
timings are unaffected.

Library code never calls this (mutating global jax config from a
package import would be rude); ``bench.py`` and the ``tools/*`` probes
opt in explicitly. ``MRT_COMPILE_CACHE=0`` disables; the env vars
``JAX_COMPILATION_CACHE_DIR`` etc. are NOT honored by the pinned jax
(0.9.0 — verified: the cache stays "disabled/not initialized"), hence
the config-API calls here.

No reference analog (the reference compiles its megakernel with NVRTC
once per process and has no cross-process cache).
"""

from __future__ import annotations

import os

# Under the repo, NOT /tmp: the sandbox VM reboots wipe /tmp, and a
# wiped cache costs the next session 15+ min of terrain recompiles
# (r4 day 3 — two reboots in one round each paid it). MRT_CACHE_DIR
# overrides. Falls back to /tmp when the repo dir is unwritable.
_REPO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "mrt_xla_cache",
)
DEFAULT_DIR = os.environ.get("MRT_CACHE_DIR", _REPO_DIR)


def _writable(path: str) -> bool:
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return True
    except OSError:
        return False


def enable(path: str = DEFAULT_DIR) -> bool:
    """Point jax at a persistent compilation cache. Returns True when
    enabled. Safe to call multiple times or before/after backend init;
    never raises (a cache is an optimization, not a dependency)."""
    if os.environ.get("MRT_COMPILE_CACHE", "1") != "1":
        return False
    # Fall back only for the IMPLICIT repo default: an explicit
    # MRT_CACHE_DIR that is unwritable is a misconfiguration the user
    # should see, not a silent /tmp redirect (ADVICE r4).
    if path == _REPO_DIR and not _writable(path):
        path = "/tmp/mrt_xla_cache"
    try:
        import jax

        # CPU runs never cache: loading an XLA:CPU AOT result on a host
        # whose machine features differ from the compile host warns
        # "could lead to execution errors such as SIGILL" (observed with
        # this jaxlib) — the CPU path is the correctness suite, so no
        # speedup is worth that. Checked via config, which does not
        # initialize a backend.
        plat = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if "cpu" in str(plat).lower():
            return False
        jax.config.update("jax_compilation_cache_dir", path)
        # Terrain-class compiles are minutes; even 2 s entries are worth
        # keeping so warm probes skip everything but tracing.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:
        return False
