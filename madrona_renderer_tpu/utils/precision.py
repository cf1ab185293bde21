"""Matmul-precision scoping for the render path.

On TPU, XLA's algebraic simplifier rewrites mul+reduce patterns (the
reference renderer's dot products: Möller–Trumbore numerators, lambert
n·l, quat rotation) into ``dot`` HLOs, and TPU dots default to bf16
passes (8 mantissa bits, ~4e-3 relative error). Measured on v5e against
f64 ground truth (demo scene, 64×64): the jnp reference's depth had
median 1.5e-3 / p99 4.5e-3 relative error under default precision, and
6e-8 / 7e-7 under "highest" — while the Pallas kernel (Mosaic codegen,
no implicit dots) was at 5e-8 regardless.

Renderer outputs are semantic (pixel-exactness is the contract —
BASELINE.json: "pixel-matching ... within ±1 LSB"), so every public
render entry point is wrapped with this decorator. It scopes only
tracing of the decorated function: user models (e.g. the PPO policy)
keep their own ambient precision.
"""

from __future__ import annotations

import functools

import jax


def f32_precise(fn):
    """Trace ``fn`` under ``jax.default_matmul_precision("highest")``."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
