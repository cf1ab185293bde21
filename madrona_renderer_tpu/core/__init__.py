"""Core data model: sim schema, state pytree, scene bake, frames."""

from .frames import Frames
from .scene import SceneData, bake_scene, configure_lighting
from .sim import ExportID, TaskGraphID, init_worlds, register_types
from .state import SimState, init_state

__all__ = [
    "ExportID",
    "Frames",
    "SceneData",
    "SimState",
    "TaskGraphID",
    "bake_scene",
    "configure_lighting",
    "init_state",
    "init_worlds",
    "register_types",
]
