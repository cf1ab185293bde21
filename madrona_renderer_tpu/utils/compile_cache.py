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

DEFAULT_DIR = "/tmp/mrt_xla_cache"


def enable(path: str = DEFAULT_DIR) -> bool:
    """Point jax at a persistent compilation cache. Returns True when
    enabled. Safe to call multiple times or before/after backend init;
    never raises (a cache is an optimization, not a dependency)."""
    if os.environ.get("MRT_COMPILE_CACHE", "1") != "1":
        return False
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
