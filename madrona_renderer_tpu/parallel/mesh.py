"""Multi-chip sharding: worlds (and optionally pixel rows) over a device mesh.

The reference is single-process single-GPU; its only parallel axis is
world-level data parallelism inside one device (one megakernel launch over
all worlds — reference ``src/mgr.cpp:453-461,177-185``). Worlds share
nothing (zero cross-world communication anywhere in the reference), so the
TPU-native scaling story is:

  * **worlds axis** sharded over the mesh — pure data parallelism, zero
    collectives, ICI idle. This is the default and scales to any fleet
    (multi-host worlds ride DCN with no inter-host traffic in the step).
  * **pixel-row axis** ("rows") additionally sharded when worlds are few
    and views are large — spatial parallelism over the ray dimension. Also
    collective-free in the forward render: each device owns full scene +
    its pixel rows.

Everything is expressed with ``jax.sharding.NamedSharding`` on a ``Mesh``
and a single ``jax.jit`` — XLA partitions the program; there is no
hand-written communication (the scaling-book recipe: pick a mesh, annotate,
let XLA do the rest).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.frames import Frames
from ..core.scene import SceneData
from ..core.state import SimState


def make_mesh(
    n_worlds_shards: Optional[int] = None,
    n_row_shards: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("worlds", "rows") mesh. Defaults to all devices on the
    worlds axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_worlds_shards is None:
        n_worlds_shards = len(devices) // n_row_shards
    n = n_worlds_shards * n_row_shards
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices ({n_worlds_shards} worlds-shards x "
            f"{n_row_shards} row-shards) but jax only sees {len(devices)} "
            f"({[d.platform for d in devices]}). For CPU testing, set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} and force "
            f"the cpu platform BEFORE jax initializes."
        )
    dev_array = np.asarray(devices[:n]).reshape(n_worlds_shards, n_row_shards)
    return Mesh(dev_array, ("worlds", "rows"))


def shard_state(state: SimState, mesh: Mesh) -> SimState:
    """Place state with the worlds axis sharded over the mesh."""
    ns = NamedSharding(mesh, P("worlds"))
    return jax.tree.map(lambda x: jax.device_put(x, ns), state)


def replicate_scene(scene: SceneData, mesh: Mesh) -> SceneData:
    """Scene data is static and small — replicate to every device."""
    ns = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, ns), scene)


def build_sharded_render(
    mesh: Mesh,
    *,
    height: int,
    width: int,
    mode: str = "rt",
    near: Optional[float] = None,
    far: float = 1000.0,
    fov_y_degrees: float = 90.0,
    chunk: int = 16,
    donate: bool = True,
    impl: str = "auto",  # "auto" | "pallas" | "jnp"
):
    """jit a full step (time advance + render) over the mesh.

    Returns ``step(state, scene) -> (state', Frames)`` with state sharded on
    worlds and frames sharded on (worlds, image rows). The caller must pass
    state/scene already placed (``shard_state`` / ``replicate_scene``);
    world count must divide the worlds-axis size.
    """
    import jax as _jax

    if impl == "auto":
        impl = (
            "pallas" if _jax.devices()[0].platform in ("tpu", "axon") else "jnp"
        )
    if mode == "rt":
        if impl == "pallas":
            from ..ops.raytrace_pallas import raytrace as render
        else:
            from ..ops.raytrace_ref import raytrace as render

        near = 0.1 if near is None else near
    else:
        if impl == "pallas":
            from ..ops.raster_pallas import rasterize as render
        else:
            from ..ops.raster_ref import rasterize as render

        near = 0.001 if near is None else near

    state_ns = NamedSharding(mesh, P("worlds"))
    # Frames: [W, C, H, Wd(,4)] → shard worlds and the H (rows) axis.
    frames_ns = Frames(
        rgb=NamedSharding(mesh, P("worlds", None, "rows")),
        depth=NamedSharding(mesh, P("worlds", None, "rows")),
        segmask=NamedSharding(mesh, P("worlds", None, "rows")),
    )
    state_shardings = jax.tree.map(
        lambda _: state_ns, _state_proto(), is_leaf=lambda x: x is None
    )

    @partial(
        jax.jit,
        donate_argnums=(0,) if donate else (),
        out_shardings=(state_shardings, frames_ns),
    )
    def step(state: SimState, scene: SceneData):
        state = dataclasses.replace(state, time=state.time + 0.05)
        frames = render(
            state,
            scene,
            height=height,
            width=width,
            near=near,
            far=far,
            fov_y_degrees=fov_y_degrees,
            chunk=chunk,
        )
        return state, frames

    return step


def _state_proto() -> SimState:
    """A structure-only SimState (leaves are None) for tree-mapping
    shardings."""
    fields = {f.name: None for f in dataclasses.fields(SimState)}
    return SimState(**fields)
