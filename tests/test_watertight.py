"""Watertightness property tests for ops/watertight.py (Woop et al.).

The load-bearing property: rays aimed exactly through edges/vertices
shared by adjacent triangles must register ≥1 hit — no cracks. The
shared-edge edge functions are exactly negated in IEEE f32 (same sheared
coordinates, swapped operands), so this holds bitwise when triangle
vertices are bitwise shared; the tests build meshes with explicit
vertex arrays (woop_intersect) and with the edge-form soup wrapper on
f32-exact coordinates (intersect_watertight).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from madrona_renderer_tpu.ops.watertight import woop_intersect, intersect_watertight
from madrona_renderer_tpu.ops.raytrace_ref import intersect_bruteforce


def _grid_mesh(n=4, span=2.0, z=0.0, jitter=None):
    """Triangulated (n×n)-quad grid in the z=z plane, explicit vertices.
    Returns (v0, v1, v2 [S, 3], verts [(n+1)², 3], faces [S, 3])."""
    xs = np.linspace(-span, span, n + 1, dtype=np.float32)
    vv, uu = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([uu.ravel(), vv.ravel(), np.full(uu.size, z, np.float32)], -1)
    if jitter is not None:
        rng = np.random.default_rng(7)
        verts[:, 2] += rng.uniform(-jitter, jitter, verts.shape[0]).astype(np.float32)
    faces = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            faces.append([a, b, d])
            faces.append([a, d, c])
    faces = np.asarray(faces, np.int32)
    v = verts[faces]  # [S, 3, 3]
    return v[:, 0], v[:, 1], v[:, 2], verts, faces


def _interior_edges(faces):
    """Edges shared by exactly two faces, as (i, j) vertex-index pairs."""
    from collections import Counter

    cnt = Counter()
    for f in faces:
        for k in range(3):
            e = tuple(sorted((f[k], f[(k + 1) % 3])))
            cnt[e] += 1
    return [e for e, c in cnt.items() if c == 2]


def _edge_targets(verts, edges, fracs):
    """Points exactly on shared edges: convex combos at f32-exact fracs."""
    pts = []
    for i, j in edges:
        for f in fracs:
            # f chosen as a power-of-two fraction: (1-f)*a + f*b rounds
            # identically however the edge is traversed.
            pts.append((1.0 - f) * verts[i] + f * verts[j])
    return np.asarray(pts, np.float32)


@pytest.mark.parametrize("jitter", [None, 0.25])
def test_edge_rays_always_hit(jitter):
    v0, v1, v2, verts, faces = _grid_mesh(n=4, jitter=jitter)
    edges = _interior_edges(faces)
    targets = _edge_targets(verts, edges, fracs=[0.25, 0.5, 0.75])
    # Also aim at every interior shared vertex.
    interior = verts[
        (np.abs(verts[:, 0]) < 2.0) & (np.abs(verts[:, 1]) < 2.0)
    ]
    targets = np.concatenate([targets, interior])

    # Rays from several off-axis origins through each target point: the
    # direction is (target - origin), so the ray passes exactly through
    # the f32 target up to the one rounding in the subtraction — which
    # cancels identically for both triangles sharing the edge.
    origins = np.array(
        [[0.3, -0.7, 5.0], [-2.1, 1.3, 7.0], [4.0, 3.0, 3.0]], np.float32
    )
    # Non-vacuous: plain Möller–Trumbore with ε=0 misses 1–2 of these
    # 129 rays per origin (measured on CPU f32); ε-slack papers over it,
    # Woop removes it structurally.
    misses = 0
    for o in origins:
        dirs = targets - o[None, :]
        t, acc, _ = woop_intersect(jnp.asarray(o), jnp.asarray(dirs),
                                   jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
        ok = np.asarray(acc & (t > 0.0) & jnp.isfinite(t))
        misses += int((~ok.any(axis=1)).sum())
    assert misses == 0, f"{misses} edge/vertex rays fell through a crack"


def test_bary_matches_moller_trumbore_interior():
    """On interior hits the Woop barycentrics agree with MT's u/v."""
    rng = np.random.default_rng(3)
    v0, v1, v2, verts, faces = _grid_mesh(n=3, jitter=0.3)
    o = np.array([0.5, -0.5, 6.0], np.float32)
    # Random points strictly inside random triangles.
    idx = rng.integers(0, len(v0), 64)
    w = rng.dirichlet([3.0, 3.0, 3.0], 64).astype(np.float32)
    pts = (w[:, :1] * v0[idx] + w[:, 1:2] * v1[idx] + w[:, 2:] * v2[idx])
    dirs = pts - o[None, :]
    t, acc, bary = woop_intersect(jnp.asarray(o), jnp.asarray(dirs),
                                  jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    t = np.asarray(t)
    acc = np.asarray(acc & jnp.isfinite(t) & (t > 0.0))
    bary = np.asarray(bary)
    hit_rows = acc[np.arange(64), idx]
    assert hit_rows.mean() > 0.95  # interior points: essentially all hit
    got = bary[np.arange(64), idx][hit_rows]
    want = w[hit_rows]
    np.testing.assert_allclose(got, want, atol=5e-4)
    # t at the aimed triangle ≈ 1 (dirs reach the target at t=1).
    np.testing.assert_allclose(t[np.arange(64), idx][hit_rows], 1.0, atol=1e-3)


def _soup_from_tris(v0, v1, v2):
    """Minimal 1-world TriangleSoup (edge form, like build_world_soup)."""
    from madrona_renderer_tpu.ops.raytrace_ref import TriangleSoup

    S = len(v0)
    z3 = jnp.zeros((1, S, 3), jnp.float32)
    z2 = jnp.zeros((1, S, 2), jnp.float32)
    return TriangleSoup(
        v0=jnp.asarray(v0)[None], e1=jnp.asarray(v1 - v0)[None],
        e2=jnp.asarray(v2 - v0)[None],
        uv0=z2, duv1=z2, duv2=z2, n0=z3, dn1=z3, dn2=z3,
        mat=jnp.zeros((1, S), jnp.int32), seg=jnp.zeros((1, S), jnp.int32),
        valid=jnp.ones((1, S), jnp.float32), density=jnp.zeros((1, S), jnp.float32),
    )


def test_soup_wrapper_contract_matches_bruteforce():
    """intersect_watertight returns the same (t, idx, hit) as
    intersect_bruteforce away from seams (interior + background rays)."""
    rng = np.random.default_rng(11)
    v0, v1, v2, verts, faces = _grid_mesh(n=3, jitter=0.3)
    soup = _soup_from_tris(v0, v1, v2)
    orig = jnp.asarray([[[0.2, -0.4, 6.0]]], jnp.float32)  # [1, 1, 3]
    # 256 random directions: some at the mesh, some into the sky.
    d = rng.normal(size=(1, 1, 256, 3)).astype(np.float32)
    d[..., 2] = -np.abs(d[..., 2]) + (rng.random((1, 1, 256)) > 0.7) * 4.0
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    near = jnp.full((1, 1), 0.01, jnp.float32)
    far = jnp.full((1, 1), 100.0, jnp.float32)

    t_w, i_w, h_w = intersect_watertight(soup, orig, dirs, near, far)
    t_m, i_m, h_m = intersect_bruteforce(soup, orig, dirs, near, far)
    h_w, h_m = np.asarray(h_w), np.asarray(h_m)
    # Hit/miss may legitimately differ only within ε of a seam; on random
    # directions that is a measure-zero-ish sliver — allow ≤2 pixels.
    assert (h_w != h_m).sum() <= 2
    both = h_w & h_m
    np.testing.assert_allclose(
        np.asarray(t_w)[both], np.asarray(t_m)[both], rtol=2e-4, atol=2e-4
    )
    same_idx = (np.asarray(i_w) == np.asarray(i_m)) | ~both
    assert same_idx.mean() > 0.98  # seam pixels may pick the twin triangle


def test_raytrace_direct_watertight_kwarg():
    """raytrace(..., watertight=True) — the documented API — must work as
    a direct call: 'watertight' is a static argname resolved before the
    jit boundary (it once leaked in as a tracer and crashed)."""
    from madrona_renderer_tpu.config import ImportedCamera, ImportedInstance
    from madrona_renderer_tpu.ops.raytrace_ref import raytrace

    from tests.helpers import build

    tri = np.array([[-1, 0, -1], [1, 0, -1], [0, 0, 1]], np.float32)
    state, scene = build(
        [tri],
        [ImportedInstance(position=[0, 3, 0], rotation=[1, 0, 0, 0],
                          scale=[1, 1, 1], object_id=0)],
        [ImportedCamera(position=[0, 0, 0], rotation=[1, 0, 0, 0])],
    )
    f_wt = raytrace(state, scene, height=16, width=16, watertight=True)
    f_mt = raytrace(state, scene, height=16, width=16, watertight=False)
    assert (np.asarray(f_wt.segmask) >= 0).any()  # the triangle is visible
    hit_wt = np.asarray(f_wt.segmask) >= 0
    hit_mt = np.asarray(f_mt.segmask) >= 0
    # Seam-free interior scene: both intersectors agree everywhere.
    np.testing.assert_array_equal(hit_wt, hit_mt)
    both = hit_wt & hit_mt
    np.testing.assert_allclose(
        np.asarray(f_wt.depth)[both], np.asarray(f_mt.depth)[both],
        rtol=1e-4, atol=1e-4,
    )


def test_raytrace_watertight_golden_parity():
    """The full jnp raytrace with watertight=True renders the smoke scene
    identically to the default intersector away from seam pixels — and
    really runs the watertight path (the env toggle once hit a stale
    jit cache and silently rendered Möller–Trumbore both times)."""
    import sys

    from tests.fixtures import ensure_fixtures, smoke_scene
    import madrona_renderer_tpu as m

    import madrona_renderer_tpu.ops.watertight as wt_mod

    # Vacuity guard: count trace-time calls into the watertight
    # intersector (each Manager re-traces its own step, so the call
    # happens at Python level during tracing). The original env-only
    # toggle silently hit a stale jit cache and compared MT with itself.
    calls = {"n": 0}
    real = wt_mod.intersect_watertight

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    kw = smoke_scene(ensure_fixtures(), num_worlds=2)
    frames = {}
    wt_mod.intersect_watertight = counting
    try:
        for wt in (False, True):
            import os

            os.environ["MRT_WATERTIGHT"] = "1" if wt else "0"
            try:
                r = m.MadronaRenderer(
                    gpu_id=0, num_worlds=2, render_mode=m.RenderMode.Raytracer,
                    batch_render_view_width=64, batch_render_view_height=64,
                    impl="jnp", **kw,
                )
                frames[wt] = (r.rgb_tensor().numpy(), r.depth_tensor().numpy())
            finally:
                os.environ.pop("MRT_WATERTIGHT", None)
            if not wt:
                assert calls["n"] == 0, "MT render called the watertight path"
            else:
                assert calls["n"] > 0, "watertight render never reached the watertight intersector"
    finally:
        wt_mod.intersect_watertight = real
    rgb_diff = (frames[False][0] != frames[True][0]).any(axis=-1)
    assert rgb_diff.mean() < 0.01, f"{rgb_diff.mean():.4f} of pixels differ"
    d0, d1 = frames[False][1], frames[True][1]
    close = np.isclose(d0, d1, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99


def test_manager_watertight_config():
    """watertight flows through the Manager config on BOTH impls: the
    jnp tier swaps intersect_watertight in; the Pallas tier runs the
    in-kernel Woop decision sweep (r4 — tests/test_watertight_pallas.py
    holds the cross-impl parity bar)."""
    from tests.fixtures import ensure_fixtures, smoke_scene
    import madrona_renderer_tpu as m

    kw = smoke_scene(ensure_fixtures(), num_worlds=2)
    for impl in ("jnp", "pallas"):
        r = m.MadronaRenderer(
            gpu_id=0, num_worlds=2, render_mode=m.RenderMode.Raytracer,
            batch_render_view_width=32, batch_render_view_height=32,
            impl=impl, watertight=True, **kw,
        )
        assert (np.asarray(r.segmask_tensor().numpy()) >= 0).any()


def test_manager_watertight_auto_never_raises():
    """VERDICT r3 #5: Manager(watertight=True) must never raise under
    impl='auto'. Since r4 'auto' is a pure platform pick (the Pallas
    kernel carries the Woop sweep natively) — on the CPU test backend
    that resolves to jnp."""
    from tests.fixtures import ensure_fixtures, smoke_scene
    import madrona_renderer_tpu as m

    kw = smoke_scene(ensure_fixtures())
    r = m.MadronaRenderer(
        gpu_id=0, num_worlds=4, render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=16, batch_render_view_height=16,
        watertight=True, **kw)
    assert r._resolve_impl() == "jnp"  # CPU platform pick, not a gate
    r.step()
    assert (r.segmask_tensor().numpy() >= 0).any()


def test_manager_watertight_env_default_routes(monkeypatch):
    """watertight=None + MRT_WATERTIGHT=1 (the documented env default,
    config.py) must resolve exactly like watertight=True on every impl —
    not silently render ε-slack where the env asked for the quality
    tier."""
    from tests.fixtures import ensure_fixtures, smoke_scene
    import madrona_renderer_tpu as m

    kw = smoke_scene(ensure_fixtures())
    monkeypatch.setenv("MRT_WATERTIGHT", "1")
    r = m.MadronaRenderer(
        gpu_id=0, num_worlds=4, render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=16, batch_render_view_height=16, **kw)
    assert r._watertight_effective()
    # The explicit-pallas form honors the env default too (the kernel
    # decision sweep, not silent ε-slack).
    r2 = m.MadronaRenderer(
        gpu_id=0, num_worlds=4, render_mode=m.RenderMode.Raytracer,
        batch_render_view_width=16, batch_render_view_height=16,
        impl="pallas", **kw)
    assert r2._watertight_effective()
    assert (r2.segmask_tensor().numpy() >= 0).any()
    monkeypatch.delenv("MRT_WATERTIGHT")
