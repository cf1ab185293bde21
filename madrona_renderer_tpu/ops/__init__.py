"""Compute ops: quaternion math and the render backends.

Reference paths (pure jnp, run anywhere — the semantic source of truth) and
Pallas TPU kernels (optimized; parity-tested to ±1 u8 LSB).
"""

from .quat import (
    euler_to_quat,
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    transform_dirs,
    transform_points,
)

__all__ = [
    "euler_to_quat",
    "quat_inverse",
    "quat_multiply",
    "quat_normalize",
    "quat_rotate",
    "quat_to_matrix",
    "transform_dirs",
    "transform_points",
]
