"""madrona_renderer_tpu — a TPU-native batch many-world renderer.

A from-scratch JAX/XLA/Pallas re-creation of the capabilities of the
madrona_renderer reference (a CUDA batch renderer for RL observation
generation): N independent worlds of static-geometry instances and cameras,
stepped in lockstep, producing per-camera RGB / depth / segmentation tensors
on-device for zero-copy consumption by ML training loops.

Public surface mirrors the reference's Python module ``madrona_renderer``
(reference ``src/bindings.cpp:18-234``):

    import madrona_renderer_tpu as m
    renderer = m.MadronaRenderer(gpu_id=0, num_worlds=4,
                                 render_mode=m.RenderMode.Raytracer, ...)
    renderer.step()
    rgb = renderer.rgb_tensor().to_torch()

plus the TPU-idiomatic functional API (``Manager.step_state``) and sharding
helpers (``madrona_renderer_tpu.parallel``) with no reference analog.
"""

from .config import (
    AdditionalMaterial,
    GeometryConfig,
    ImportedAsset,
    ImportedCamera,
    ImportedInstance,
    ManagerConfig,
    RenderConfig,
    RenderMode,
    WorldInit,
)
from .core.frames import Frames
from .core.scene import SceneData, bake_scene, configure_lighting
from .core.state import SimState, init_state
from .manager import MadronaRenderer, Manager
from .tensor import Tensor

__version__ = "0.1.0"


def inspect(a) -> None:
    """Debug ndarray dumper, parity with the reference binding
    (``src/bindings.cpp:104-120``)."""
    import numpy as np

    arr = np.asarray(a)
    print(f"Array data pointer : 0x{arr.ctypes.data:x}")
    print(f"Array dimension : {arr.ndim}")
    for i in range(arr.ndim):
        print(f"Array dimension [{i}] : {arr.shape[i]}")
        print(f"Array stride    [{i}] : {arr.strides[i]}")
    print(f"Array dtype: {arr.dtype}")


__all__ = [
    "AdditionalMaterial",
    "Frames",
    "GeometryConfig",
    "ImportedAsset",
    "ImportedCamera",
    "ImportedInstance",
    "MadronaRenderer",
    "Manager",
    "ManagerConfig",
    "RenderConfig",
    "RenderMode",
    "SceneData",
    "SimState",
    "Tensor",
    "WorldInit",
    "bake_scene",
    "configure_lighting",
    "init_state",
    "inspect",
]
