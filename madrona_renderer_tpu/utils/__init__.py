"""Profiling, checkpointing, and device-side debug utilities."""

from .checkpoint import load_state, save_state
from .debug import LOG, check_finite
from .profiling import PhaseTimer, trace

__all__ = ["LOG", "PhaseTimer", "check_finite", "load_state", "save_state", "trace"]
