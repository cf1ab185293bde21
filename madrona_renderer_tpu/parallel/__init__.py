"""Multi-chip scaling (no reference analog — the reference is single-GPU;
see SURVEY.md §2.3)."""

from .mesh import build_sharded_render, make_mesh, replicate_scene, shard_state

__all__ = ["build_sharded_render", "make_mesh", "replicate_scene", "shard_state"]
