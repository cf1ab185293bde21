"""Device-side debug logging + invariant checks.

Analog of the reference's GPU printf path (``mwGPU::HostPrint::log`` via the
``LOG(...)`` macro, reference ``src/sim.cpp:6-11``): ``LOG`` prints from
inside jitted code; ``check_finite`` is the assertion analog (the reference
has no sanitizers — SURVEY.md §5.2 — ours designs races out with purity and
uses checkify-style value checks instead).
"""

from __future__ import annotations

import os

import jax

# Matches the reference's compile-time gating (LOG is a no-op off-GPU-mode);
# ours is env-gated: MRT_DEBUG_LOG=1 enables.
_ENABLED = os.environ.get("MRT_DEBUG_LOG", "0") == "1"


def LOG(fmt: str, *args, **kwargs) -> None:
    """Print from inside jit when MRT_DEBUG_LOG=1; no-op otherwise."""
    if _ENABLED:
        jax.debug.print(fmt, *args, **kwargs)


def check_finite(name: str, x) -> None:
    """Debug-mode NaN/Inf tripwire on any array in the step path."""
    if _ENABLED:
        import jax.numpy as jnp

        bad = jnp.logical_not(jnp.isfinite(x)).sum()
        jax.debug.print("check_finite[" + name + "]: nonfinite={}", bad)
