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

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """jax.distributed.initialize, tolerating single-process use.

    Must run before any JAX call that initializes the XLA backend
    (jax.devices(), jax.process_count(), any computation) — so this checks
    the distributed client state directly instead of process_count(),
    which would itself initialize the backend and turn this into a no-op.
    Raises if the backend is already initialized in a multi-process env.

    Extra kwargs pass through to ``jax.distributed.initialize`` — notably
    ``initialization_timeout`` (seconds to wait for the fleet to assemble;
    a worker that never joins surfaces as a RuntimeError here, the
    failure-detection story for fleet bootstrap) and
    ``heartbeat_timeout_seconds`` (a worker dying mid-run takes down the
    survivors instead of hanging them — crash-only parity with the
    reference's FATAL error model, SURVEY.md §5.3).
    """
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (ValueError, RuntimeError) as e:
        # ValueError: jax's cluster auto-detection found no coordinator —
        # a single-process run, fine to continue on local devices.
        # RuntimeError: the XLA backend is already initialized (too late
        # to join a fleet). With explicit args either is a real error.
        if explicit:
            raise
        # Env-driven case: if the environment clearly describes a fleet of
        # more than one process, degrading to single-process would be
        # silent wrongness (every host would render every world) — raise.
        # A 1-process "fleet" is harmless (e.g. the axon TPU plugin sets
        # TPU_WORKER_HOSTNAMES=localhost on single-chip hosts, which is
        # why plain env sniffing can't gate the initialize() call itself).
        if _env_fleet_size() > 1:
            if isinstance(e, RuntimeError):
                raise RuntimeError(
                    "multihost.initialize() was called after the XLA backend "
                    "was already initialized, but the environment describes a "
                    f"{_env_fleet_size()}-process fleet — call initialize() "
                    "before any other jax use (jax.devices(), computations)"
                ) from e
            raise RuntimeError(
                "jax.distributed coordinator auto-detection failed, but the "
                f"environment describes a {_env_fleet_size()}-process fleet — "
                "degrading to single-process would make every host render "
                "every world; pass coordinator_address/num_processes/"
                "process_id explicitly"
            ) from e


def _env_fleet_size() -> int:
    """Best-effort process count implied by cluster env vars (1 = none)."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    n = len([h for h in hosts.split(",") if h.strip()]) if hosts else 1
    for var in ("JAX_NUM_PROCESSES", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        v = os.environ.get(var)
        if v and v.isdigit():
            n = max(n, int(v))
    return max(n, 1)


def global_world_mesh() -> Mesh:
    """All global devices on one "worlds" axis (+ trivial "rows")."""
    devs = np.asarray(jax.devices()).reshape(len(jax.devices()), 1)
    return Mesh(devs, ("worlds", "rows"))


def local_world_slice(num_worlds_global: int) -> slice:
    """Which contiguous block of worlds this process should construct.
    World counts must divide evenly across processes (use
    ``local_world_range`` for uneven fleets)."""
    n_proc = jax.process_count()
    if num_worlds_global % n_proc:
        raise ValueError(
            f"{num_worlds_global} worlds not divisible by {n_proc} processes"
        )
    per = num_worlds_global // n_proc
    start = per * jax.process_index()
    return slice(start, start + per)


def local_world_range(num_worlds_global: int) -> slice:
    """Uneven variant of ``local_world_slice``: the first
    ``num_worlds_global % process_count`` processes take one extra world.
    Worlds are embarrassingly parallel (no cross-world collectives —
    SURVEY.md §2.3), so per-process world counts may differ freely; each
    process renders its slice with a locally-jitted step."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per, extra = divmod(num_worlds_global, n_proc)
    start = per * pid + min(pid, extra)
    stop = start + per + (1 if pid < extra else 0)
    return slice(start, stop)
