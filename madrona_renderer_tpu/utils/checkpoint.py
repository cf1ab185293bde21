"""Checkpoint / resume.

The reference has no persistence (state is reconstructable from inputs;
SURVEY.md §5.4). Our state is a pytree, so checkpointing is nearly free —
provided for long RL runs. Plain ``.npz`` (no extra deps); orbax works on
the same pytrees if the host app prefers it.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core.state import SimState


def _norm(path: str) -> str:
    # np.savez appends '.npz' to suffix-less paths; normalize in both
    # directions so load_state(path) accepts the exact string given to
    # save_state(path).
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: SimState) -> None:
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(SimState)
    }
    np.savez(_norm(path), **arrays)


def load_state(path: str, device=None) -> SimState:
    with np.load(_norm(path)) as data:
        kwargs = {k: data[k] for k in data.files}
    # Forward compatibility for checkpoints written before a SimState
    # field existed: per-camera fov/znear default to 0 ("inherit the call
    # defaults" — the pre-field behavior exactly).
    if "camera_pos" in kwargs:
        cam_shape = kwargs["camera_pos"].shape[:2]
        for field in ("camera_fov", "camera_znear"):
            kwargs.setdefault(field, np.zeros(cam_shape, np.float32))
    missing = {f.name for f in dataclasses.fields(SimState)} - set(kwargs)
    if missing:
        raise ValueError(
            f"checkpoint {path!r} lacks SimState fields {sorted(missing)}"
        )
    state = SimState(**kwargs)
    put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
    return jax.tree.map(put, state)


def save_training_checkpoint(path: str, tree) -> None:
    """Checkpoint an arbitrary pytree (e.g. ``{"params": ..., "opt_state":
    ..., "sim_state": SimState}`` — a whole PPO run) via orbax.

    The npz pair above covers the SimState-only case with zero deps;
    nested training pytrees (optimizer states are arbitrarily nested) go
    through orbax's StandardCheckpointer. ``path`` becomes a checkpoint
    directory. Raises NotImplementedError if orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "training checkpoints require orbax-checkpoint"
        ) from e
    import os

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_training_checkpoint(path: str, template=None):
    """Restore a pytree saved by `save_training_checkpoint`.

    ``template`` (a matching pytree of arrays/shape-dtype structs, e.g.
    the freshly-initialized training state) restores exact array types;
    without it orbax returns the raw saved structure."""
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "training checkpoints require orbax-checkpoint"
        ) from e
    import os

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))
