"""Quaternion / rigid-transform math used throughout the renderer.

Conventions (matching the reference renderer's observable behavior):
  * Quaternions are stored ``(w, x, y, z)`` — see the reference's python
    smoke test which passes ``rotation=[0.707107, 0.707107, 0, 0]  # w,x,y,z``
    (reference ``scripts/test.py:38``).
  * World space is right-handed, Z-up.
  * Camera local frame: +X right, +Y forward, +Z up. (Derived numerically
    from the reference test camera: quat (0.913, -0.112, 0.048, -0.388) at
    position (-22.3, -21.8, 27.1) rotates local +Y onto the direction toward
    the scene content at the origin — reference ``scripts/test.py:51-56``.)

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) ``[..., 4]`` to unit length."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v [..., 3]`` by quaternion(s) ``q [..., 4]`` (w,x,y,z).

    Uses the standard ``v' = v + 2*cross(q.xyz, cross(q.xyz, v) + w*v)``
    formulation (8 mul + 2 cross), broadcast-friendly.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv + w * v)
    return v + 2.0 * uuv


def quat_rotate_planar(qw, qx, qy, qz, vx, vy, vz):
    """Per-component ``quat_rotate`` twin for planar (layout-aware)
    pipelines: same formulation term-for-term
    (``v' = v + 2*cross(u, cross(u, v) + w*v)``, numpy cross order), on
    scalar component planes instead of ``[..., 3]`` arrays — whose 3-lane
    minor dim tile-pads 42× on TPU. Returns ``(x, y, z)``."""
    uvx = qy * vz - qz * vy
    uvy = qz * vx - qx * vz
    uvz = qx * vy - qy * vx
    ax = uvx + qw * vx
    ay = uvy + qw * vy
    az = uvz + qw * vz
    uuvx = qy * az - qz * ay
    uuvy = qz * ax - qx * az
    uuvz = qx * ay - qy * ax
    return (vx + 2.0 * uuvx, vy + 2.0 * uuvy, vz + 2.0 * uuvz)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of unit quaternion(s): conjugate."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a*b`` of quaternions ``[..., 4]`` (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) ``[..., 4]`` → rotation matrix ``[..., 3, 3]``.

    Columns are the rotated basis vectors: ``m @ v == quat_rotate(q, v)``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def euler_to_quat(yaw: jnp.ndarray, pitch: jnp.ndarray) -> jnp.ndarray:
    """Yaw (about Z) + pitch (about X) → quaternion (w,x,y,z).

    Mirrors the reference's ``eulerToQuat`` helper semantics
    (reference ``src/sim.cpp:20-38``: ex=pitch, ey=0, ez=yaw).
    """
    ex, ez = pitch, yaw
    sx, cx = jnp.sin(ex * 0.5), jnp.cos(ex * 0.5)
    sz, cz = jnp.sin(ez * 0.5), jnp.cos(ez * 0.5)
    # ey == 0 → sy=0, cy=1
    qx = sx * cz
    qy = sx * sz
    qz = cx * sz
    qw = cx * cz
    return jnp.stack([qw, qx, qy, qz], axis=-1)


def transform_points(
    pos: jnp.ndarray, rot: jnp.ndarray, scale: jnp.ndarray, pts: jnp.ndarray
) -> jnp.ndarray:
    """Apply TRS transform: ``rot * (scale ⊙ pts) + pos``.

    Matches the instance transform order of the reference render pipeline
    (instance ``position/rotation/scale`` components on renderable entities,
    reference ``src/sim.cpp:151-156``).

    pos: [..., 3], rot: [..., 4], scale: [..., 3], pts: [..., 3]; all
    broadcastable.
    """
    return quat_rotate(rot, scale * pts) + pos


def transform_dirs(rot: jnp.ndarray, scale: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Transform direction-like vectors (no translation): ``rot * (scale ⊙ d)``."""
    return quat_rotate(rot, scale * d)
