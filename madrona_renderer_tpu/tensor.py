"""Tensor export shim: the boundary between the JAX core and ML frameworks.

The reference wraps raw device pointers in ``madrona::py::Tensor`` with
zero-copy ``.to_torch()`` via DLPack (reference ``src/mgr.cpp:186-193``,
``src/bindings.cpp:19``; consumed at ``scripts/test.py:137,151``) and — the
key contract — writes into exported *state* tensors are visible to the next
``step()`` (``scripts/test.py:144-150``): the export is the live simulation
state, not a copy.

TPU-native translation:
  * **Output tensors** (rgb/depth/segmask) wrap the jax.Array produced by
    the latest step. ``.to_jax()`` is zero-copy; ``.to_torch()`` /
    ``.numpy()`` materialize on host (torch in this build is CPU-only, so a
    device→host copy is inherent; from host numpy into torch is zero-copy).
  * **State tensors** (instance/camera position/rotation) wrap a *live host
    mirror*: a numpy array the Manager re-uploads at the start of every
    ``step()``. ``.to_torch()`` returns a torch tensor sharing the mirror's
    memory, so the reference's in-place mutation pattern
    (``positions[0][2] += 1.0; renderer.step()``) works verbatim.
  * The TPU-idiomatic fast path — no host round-trip at all — is the
    functional API (``Manager.render_state`` / ``step_state``), where state
    stays device-resident; the mirror exists for API parity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Tensor:
    """Export handle. Analog of ``madrona::py::Tensor``."""

    def __init__(self, host: Optional[np.ndarray] = None, device=None):
        assert (host is None) != (device is None)
        self._host = host
        self._device = device

    @property
    def shape(self):
        return tuple(self._host.shape if self._host is not None else self._device.shape)

    @property
    def dtype(self):
        return self._host.dtype if self._host is not None else self._device.dtype

    def numpy(self) -> np.ndarray:
        """Host ndarray. Live (shared) for state tensors; a copy for outputs."""
        if self._host is not None:
            return self._host
        return np.asarray(self._device)

    def to_jax(self):
        """jax.Array view. Zero-copy for outputs; uploads for state mirrors."""
        if self._device is not None:
            return self._device
        import jax.numpy as jnp

        return jnp.asarray(self._host)

    def to_torch(self):
        """torch tensor. State tensors share memory with the live mirror
        (writes take effect on the next step); output tensors are snapshots."""
        import torch

        if self._host is not None:
            return torch.from_numpy(self._host)
        # Outputs are snapshots; copy so torch gets a writable buffer.
        return torch.from_numpy(np.array(self._device))

    def device_ptr(self) -> int:
        """Raw device buffer address of the underlying array (0 for host
        mirrors). Analog of ``Manager::rgbCudaPtr`` etc.
        (reference ``src/mgr.cpp:607-620``)."""
        if self._device is None:
            return self._host.ctypes.data
        try:
            return self._device.unsafe_buffer_pointer()
        except Exception:
            return 0
