"""Profiling/tracing utilities.

The reference links the engine's host-side event tracer but never invokes
it; the only live profiling is the headless FPS printout (SURVEY.md §5.1).
TPU-native equivalents, both actually wired in:

  * ``trace(logdir)`` — captures a jax.profiler trace (XLA ops, HBM, ICI)
    viewable in TensorBoard/Perfetto; used by ``headless --trace``.
  * ``PhaseTimer`` — wall-clock per-phase timing with explicit device sync,
    the honest way to time dispatch-async jax code.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall time per named phase, syncing the device at phase
    end so async dispatch can't hide work."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: {1000 * total / n:.3f} ms avg over {n} ({total:.3f} s total)")
        return "\n".join(lines)
