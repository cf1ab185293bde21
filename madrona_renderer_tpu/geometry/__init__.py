"""Acceleration-structure bake (Morton clusters; see bvh.py)."""

from .bvh import ClusterBVH, aabb_corners, build_clusters, morton_codes

__all__ = ["ClusterBVH", "aabb_corners", "build_clusters", "morton_codes"]
