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
from jax import lax

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

    Non-positive prev depths (``Frames.depth`` stores 0 for misses) map
    to ``far`` — the unseeded window — so previously-background pixels
    render normally in the MAIN pass and a re-miss is recognized as a
    true miss instead of a suspect. Without this, every sky pixel would
    ride the repair pass every frame.
    """
    far = float(kw.get("far", 1000.0))
    prev = prev_depth.astype(jnp.float32)
    seed = jnp.where(
        prev > 0.0,
        jnp.minimum(prev * slack, far),
        jnp.float32(far),
    )
    f1 = raytrace(state, scene, seed_t=seed, **kw)
    # Suspect = missed under a finite window (true hit may be beyond it).
    suspect = (f1.segmask < 0) & (seed < far)

    names = [fld.name for fld in dataclasses.fields(f1)]
    vals1 = {n: getattr(f1, n) for n in names}
    present = [n for n in names if vals1[n] is not None]

    def _merge(a, b):
        m = suspect
        if a.ndim > m.ndim:  # rgb carries a trailing channel dim
            m = m[..., None]
        return jnp.where(m, b, a)

    def _repair(_):
        seed2 = jnp.where(suspect, jnp.float32(far), jnp.float32(0.0))
        f2 = raytrace(state, scene, seed_t=seed2, **kw)
        return tuple(_merge(vals1[n], getattr(f2, n)) for n in present)

    def _clean(_):
        return tuple(vals1[n] for n in present)

    # Runtime skip of the repair kernel on suspect-free frames (static
    # scenes, converged warm rollouts): with zero suspects the merge is
    # the identity on the main pass, so both branches are bitwise-equal
    # by construction and the HLO conditional only ever pays the
    # any-reduce when the seed was everywhere-valid.
    merged = lax.cond(jnp.any(suspect), _repair, _clean, None)
    out = dict(zip(present, merged))
    return type(f1)(**{n: out.get(n) for n in names})


def raytrace_prepass(
    state,
    scene,
    *,
    factor: int = 8,
    slack: float = 1.02,
    height: int,
    width: int,
    **kw,
):
    """Coarse-depth-prepass warm start (VERDICT r3 #3's second lever):
    render a 1/``factor``-resolution depth map first, conservatively
    max-pool it 3x3, and use it to seed the full-resolution render via
    the same two-pass repair merge as :func:`raytrace_warmstart` —
    bitwise-equal to an unseeded ``raytrace`` for ANY scene.

    Unlike the temporal warm start this needs no previous frame, so it
    covers cold starts, teleports, and single-shot renders. Coarse
    misses map to ``far`` BEFORE pooling, so silhouette neighborhoods
    get the full (conservative) search window rather than a too-small
    neighbor depth; the repair pass catches whatever conservatism
    misses (coarse pixel centers differ from fine ones, so a coarse
    sample is a heuristic, never trusted for correctness).
    """
    if factor < 2:
        raise ValueError("prepass factor must be >= 2")
    far = float(kw.get("far", 1000.0))
    hc = max(height // factor, 8)
    wc = max(width // factor, 8)
    # Only coarse.depth/segmask are consumed — render the coarse pass
    # with the cheapest shading (no shadow sweeps, nearest sampling);
    # neither affects depth or segmask, so the final merge stays
    # bitwise-equal to an unseeded full-shading render.
    ckw = dict(kw, shadows=False, texture_filter="nearest")
    coarse = raytrace(state, scene, height=hc, width=wc, **ckw)
    d = jnp.where(coarse.segmask >= 0, coarse.depth, jnp.float32(far))
    # 3x3 conservative max-pool (edge-padded).
    dp = jnp.pad(d, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    m = d
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            m = jnp.maximum(m, dp[:, :, dy:dy + hc, dx:dx + wc])
    # Nearest-neighbour upsample to (height, width). Coarse pixel i
    # covers fine rows [i*height/hc, (i+1)*height/hc) — indexing by
    # floor(j*hc/height) is exact for divisible sizes and conservative
    # enough otherwise (the max-pool already absorbed +-1 coarse px).
    ys = (jnp.arange(height) * hc) // height
    xs = (jnp.arange(width) * wc) // width
    up = m[:, :, ys][:, :, :, xs]
    return raytrace_warmstart(
        state, scene, prev_depth=up, slack=slack,
        height=height, width=width, **kw,
    )
