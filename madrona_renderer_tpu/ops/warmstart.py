"""Temporal depth warm-start with exactness repair (VERDICT r3 #3).

Re-creates nothing in the reference (its CUDA raytracer traces every
frame cold — reference ``src/mgr.cpp:443-492``); this is a TPU-native
performance tier on top of the kernel's per-pixel ``seed_t`` search
window (ops/raytrace_pallas.py).

Scheme — two seeded passes whose merge is ALWAYS bitwise-equal to an
unseeded render, no matter how stale the seed:

 1. main pass: ``best_t`` seeded with ``prev_depth x slack`` — tiles
    whose pixels all find hits inside their seeds skip every cluster
    beyond the seed via the occlusion early-exit;
 2. suspects: pixels that MISSED under a finite seed (their true hit
    may lie beyond it — or they are true background);
 3. repair pass: suspects re-rendered unseeded while every other pixel
    is seeded 0 (inert: accepts nothing, never holds the tile's
    occlusion exit back — whole tiles with no suspects sweep nothing);
 4. per-pixel merge of the two passes.

Correctness argument (pinned bitwise in tests/test_warmstart.py):
non-suspect pixels either hit inside a valid upper bound (the true
winner — argmin under an upper bound that admits it) or missed with
seed >= far (a true miss); suspect pixels come from the repair pass,
which renders them with the unseeded window. Stale, garbage, or
adversarial seeds only move pixels into the repair pass.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .raytrace_pallas import raytrace


def raytrace_warmstart(
    state,
    scene,
    *,
    prev_depth,
    slack: float = 1.01,
    **kw,
):
    """Render with a previous-frame depth warm start; bitwise-equal to
    ``raytrace(state, scene, **kw)`` for ANY ``prev_depth``.

    prev_depth: [W, C, H, W] ray-t values (a previous Frames.depth).
    slack: multiplicative headroom for inter-frame motion; larger values
    repair fewer pixels but cull less.
    """
    far = float(kw.get("far", 1000.0))
    seed = jnp.minimum(prev_depth.astype(jnp.float32) * slack, far)
    f1 = raytrace(state, scene, seed_t=seed, **kw)
    # Suspect = missed under a finite window (true hit may be beyond it).
    suspect = (f1.segmask < 0) & (seed < far)
    seed2 = jnp.where(suspect, jnp.float32(far), jnp.float32(0.0))
    f2 = raytrace(state, scene, seed_t=seed2, **kw)

    def merge(a, b):
        m = suspect
        if a.ndim > m.ndim:  # rgb carries a trailing channel dim
            m = m[..., None]
        return jnp.where(m, b, a)

    out = {}
    for fld in dataclasses.fields(f1):
        a = getattr(f1, fld.name)
        b = getattr(f2, fld.name)
        out[fld.name] = merge(a, b) if a is not None else None
    return type(f1)(**out)
