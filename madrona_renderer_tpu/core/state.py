"""Simulation state: the TPU-native ECS table.

The reference's ECS stores per-world archetype tables whose exported columns
are live, contiguous, cross-world-concatenated device buffers (export usage:
reference ``src/mgr.cpp:186-193``; archetypes ``src/types.hpp:20-33``). Our
equivalent is a pytree of fixed-capacity SoA arrays — one array per
component, shape ``[num_worlds, capacity, ...]`` plus a validity mask. The
arrays *are* the export surface: the flat ``[total, ...]`` tensors the
Python API hands out are reshapes/gathers of these (see
``madrona_renderer_tpu.tensor``).

Capacity padding replaces the reference's per-world max computation
(``src/mgr.cpp:378-388`` computes max instances/views per world for buffer
sizing — the identical idea, turned into static shapes).

World init semantics replicate ``Sim::Sim`` (reference ``src/sim.cpp:135-176``):
each world copies ``num_instances`` instances starting at ``instance_offset``
from the shared imported-instance array (worlds may alias the same slice and
then evolve independently), and likewise for cameras. Camera views get
fov=90°, znear=1e-3 (``src/sim.cpp:168-171``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ImportedCamera, ImportedInstance, WorldInit


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    """All mutable per-step simulation state. Shapes: W worlds, I instance
    capacity, C camera capacity."""

    instance_pos: jax.Array  # f32 [W, I, 3]
    instance_rot: jax.Array  # f32 [W, I, 4] (w, x, y, z)
    instance_scale: jax.Array  # f32 [W, I, 3]
    instance_obj: jax.Array  # i32 [W, I]
    instance_valid: jax.Array  # f32 [W, I] (1.0 live, 0.0 empty slot)
    camera_pos: jax.Array  # f32 [W, C, 3]
    camera_rot: jax.Array  # f32 [W, C, 4]
    camera_valid: jax.Array  # f32 [W, C]
    # Per-view camera parameters; 0.0 = inherit the render-call default
    # (reference pins fov=90, znear=1e-3 at attachEntityToView,
    # src/sim.cpp:168-171 — ours generalize to heterogeneous views).
    camera_fov: jax.Array  # f32 [W, C] (degrees, vertical)
    camera_znear: jax.Array  # f32 [W, C]
    # TimeSingleton analog: advanced +0.05 per step
    # (reference timeUpdateSys, src/sim.cpp:73-77).
    time: jax.Array  # f32 [W]

    @property
    def num_worlds(self) -> int:
        return int(self.instance_pos.shape[0])

    @property
    def max_instances(self) -> int:
        return int(self.instance_pos.shape[1])

    @property
    def max_cameras(self) -> int:
        return int(self.camera_pos.shape[1])


def _counts(worlds: Sequence[WorldInit]) -> Tuple[np.ndarray, np.ndarray]:
    inst = np.asarray([w.num_instances for w in worlds], np.int64)
    cams = np.asarray([w.num_cameras for w in worlds], np.int64)
    return inst, cams


def init_state(
    instances: Sequence[ImportedInstance],
    cameras: Sequence[ImportedCamera],
    worlds: Sequence[WorldInit],
    device: "jax.Device | None" = None,
) -> SimState:
    """Build the initial SimState via the ECS layer, then one device_put.

    This is the analog of on-device world init inside the executor ctor
    (reference ``MADRONA_BUILD_MWGPU_ENTRY`` → per-world ``Sim::Sim``,
    ``src/sim.cpp:135-182``); at our scale host-side numpy assembly followed
    by a single transfer is both simpler and faster than a device kernel.
    The SimState is a typed view over the ECS archetype tables declared in
    :mod:`madrona_renderer_tpu.core.sim`.
    """
    from .sim import init_worlds, register_types
    from ..ecs.registry import VALID

    inst_counts, cam_counts = _counts(worlds)
    max_i = max(int(inst_counts.max(initial=1)), 1)
    max_c = max(int(cam_counts.max(initial=1)), 1)

    registry = register_types(max_i, max_c)
    tables = init_worlds(registry, instances, cameras, worlds)

    rend = tables.archetypes["renderable"]
    agent = tables.archetypes["agent"]
    # Empty rotation slots get identity quats (w=1) so padded math stays
    # finite.
    for rot, valid in ((rend["rotation"], rend[VALID]), (agent["rotation"], agent[VALID])):
        rot[..., 0] = np.where(valid > 0, rot[..., 0], 1.0)

    state = SimState(
        instance_pos=rend["position"],
        instance_rot=rend["rotation"],
        instance_scale=rend["scale"],
        instance_obj=rend["object_id"],
        instance_valid=rend[VALID],
        camera_pos=agent["position"],
        camera_rot=agent["rotation"],
        camera_valid=agent[VALID],
        camera_fov=agent["fov"],
        camera_znear=agent["znear"],
        time=tables.singletons["time"],
    )
    put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
    return jax.tree.map(lambda x: put(jnp.asarray(x)), state)
