"""Multi-host (fleet) support.

Worlds are embarrassingly parallel (SURVEY.md §2.3: the reference has zero
cross-world communication), so a multi-host deployment is N independent
world shards over DCN — no inter-host traffic in the step path. This module
is the thin bootstrap: initialize the JAX distributed runtime, build a
global mesh, and place each host's world slice.

Typical use (same script on every host):

    from madrona_renderer_tpu.parallel import multihost
    multihost.initialize()                  # env-driven (TPU pods: automatic)
    mesh = multihost.global_world_mesh()
    step = build_sharded_render(mesh, ...)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize, tolerating single-process use (no-op if
    already initialized or nothing to coordinate)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Single-process / env not set: fine — local devices only.
        pass


def global_world_mesh() -> Mesh:
    """All global devices on one "worlds" axis (+ trivial "rows")."""
    devs = np.asarray(jax.devices()).reshape(len(jax.devices()), 1)
    return Mesh(devs, ("worlds", "rows"))


def local_world_slice(num_worlds_global: int) -> slice:
    """Which contiguous block of worlds this process should construct.
    World counts must divide evenly across processes."""
    n_proc = jax.process_count()
    if num_worlds_global % n_proc:
        raise ValueError(
            f"{num_worlds_global} worlds not divisible by {n_proc} processes"
        )
    per = num_worlds_global // n_proc
    start = per * jax.process_index()
    return slice(start, start + per)
