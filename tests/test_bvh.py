"""Cluster-BVH bake tests."""

import numpy as np
import pytest

from madrona_renderer_tpu.geometry.bvh import aabb_corners, build_clusters, morton_codes


def _random_tris(rng, n):
    v0 = rng.normal(size=(n, 3)).astype(np.float32) * 10
    e1 = rng.normal(size=(n, 3)).astype(np.float32)
    e2 = rng.normal(size=(n, 3)).astype(np.float32)
    return v0, e1, e2


def test_clusters_cover_all_triangles(rng):
    n = 200
    v0, e1, e2 = _random_tris(rng, n)
    valid = np.ones((n,), bool)
    bvh = build_clusters(v0, e1, e2, valid, cluster_size=64)
    # Permutation is a bijection.
    assert sorted(bvh.order.tolist()) == list(range(n))
    # Every valid triangle's vertices inside its cluster AABB.
    sv0, se1, se2 = v0[bvh.order], e1[bvh.order], e2[bvh.order]
    verts = np.stack([sv0, sv0 + se1, sv0 + se2], axis=1)
    for c in range(bvh.cluster_min.shape[0]):
        sl = slice(c * 64, min((c + 1) * 64, n))
        vs = verts[sl].reshape(-1, 3)
        if not len(vs):
            continue
        assert bvh.cluster_valid[c] == 1.0
        assert (vs >= bvh.cluster_min[c] - 1e-5).all()
        assert (vs <= bvh.cluster_max[c] + 1e-5).all()


def test_padding_sorts_to_tail(rng):
    n = 100
    v0, e1, e2 = _random_tris(rng, n)
    valid = np.zeros((n,), bool)
    valid[:40] = True  # only first 40 real
    bvh = build_clusters(v0, e1, e2, valid, cluster_size=64)
    # All valid triangles land in the first cluster (40 < 64).
    first = bvh.order[:40]
    assert set(first.tolist()) == set(range(40))
    assert bvh.cluster_valid[0] == 1.0
    assert bvh.cluster_valid[1] == 0.0


def test_morton_locality(rng):
    """Points close in space get closer codes than distant points (spot)."""
    pts = np.array([[0, 0, 0], [0.01, 0, 0], [100, 100, 100]], np.float32)
    codes = morton_codes(pts)
    assert abs(int(codes[0]) - int(codes[1])) < abs(int(codes[0]) - int(codes[2]))


def test_aabb_corners():
    c = aabb_corners(np.array([0.0, 0, 0]), np.array([1.0, 2, 3]))
    assert c.shape == (8, 3)
    assert (c.min(0) == [0, 0, 0]).all() and (c.max(0) == [1, 2, 3]).all()


def test_morton_sort_tightens_clusters(rng):
    """Morton ordering should produce tighter clusters than input order for
    spatially-shuffled triangles (total AABB surface heuristic)."""
    n = 256
    centers = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    v0 = centers
    e1 = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    e2 = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    valid = np.ones((n,), bool)
    bvh = build_clusters(v0, e1, e2, valid, cluster_size=64)

    def total_area(cmin, cmax, cv):
        d = np.maximum(cmax - cmin, 0)
        areas = 2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2])
        return float((areas * cv).sum())

    # Unsorted clusters for comparison.
    unsorted = build_clusters(v0, e1, e2, valid, cluster_size=64)
    # Monkey-patch comparison: compute unsorted-cluster AABBs directly.
    cmins, cmaxs, cvs = [], [], []
    verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    for c in range(4):
        vs = verts[c * 64 : (c + 1) * 64].reshape(-1, 3)
        cmins.append(vs.min(0))
        cmaxs.append(vs.max(0))
        cvs.append(1.0)
    area_unsorted = total_area(np.array(cmins), np.array(cmaxs), np.array(cvs))
    area_sorted = total_area(bvh.cluster_min, bvh.cluster_max, bvh.cluster_valid)
    assert area_sorted < area_unsorted
