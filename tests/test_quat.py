"""Unit tests for quaternion/transform math."""

import numpy as np
import jax.numpy as jnp

from madrona_renderer_tpu.ops.quat import (
    euler_to_quat,
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    transform_points,
)


def _np_quat_rotate(q, v):
    w, x, y, z = q
    u = np.array([x, y, z])
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def test_rotate_identity():
    q = jnp.array([1.0, 0, 0, 0])
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat_rotate(q, v), v, atol=1e-6)


def test_rotate_90_about_x():
    # The smoke-test instance rotation (w=x=0.707...): 90° about X maps
    # +Y → +Z (reference scripts/test.py:38).
    q = jnp.array([0.7071068, 0.7071068, 0.0, 0.0])
    v = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(quat_rotate(q, v), [0.0, 0.0, 1.0], atol=1e-6)


def test_rotate_matches_matrix(rng):
    q = quat_normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    m = quat_to_matrix(q)
    np.testing.assert_allclose(
        quat_rotate(q, v), jnp.einsum("bij,bj->bi", m, v), atol=1e-5
    )


def test_rotate_batch_matches_numpy(rng):
    qs = rng.normal(size=(16, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    vs = rng.normal(size=(16, 3))
    got = np.asarray(quat_rotate(jnp.asarray(qs, jnp.float32), jnp.asarray(vs, jnp.float32)))
    want = np.stack([_np_quat_rotate(q, v) for q, v in zip(qs, vs)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inverse_roundtrip(rng):
    q = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    back = quat_rotate(quat_inverse(q), quat_rotate(q, v))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_multiply_composes(rng):
    a = quat_normalize(jnp.asarray(rng.normal(size=(4,)), jnp.float32))
    b = quat_normalize(jnp.asarray(rng.normal(size=(4,)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    np.testing.assert_allclose(
        quat_rotate(quat_multiply(a, b), v),
        quat_rotate(a, quat_rotate(b, v)),
        atol=1e-5,
    )


def test_euler_to_quat_yaw():
    # Pure yaw of 90° about Z maps +X → +Y (reference eulerToQuat,
    # src/sim.cpp:20-38 with pitch=0).
    q = euler_to_quat(jnp.float32(np.pi / 2), jnp.float32(0.0))
    np.testing.assert_allclose(
        quat_rotate(q, jnp.array([1.0, 0, 0])), [0.0, 1.0, 0.0], atol=1e-6
    )


def test_transform_points_trs_order():
    # scale then rotate then translate
    pos = jnp.array([1.0, 0.0, 0.0])
    rot = jnp.array([0.7071068, 0.7071068, 0.0, 0.0])  # 90° about X
    scale = jnp.array([2.0, 2.0, 2.0])
    pts = jnp.array([0.0, 1.0, 0.0])
    # scale → (0,2,0); rotate → (0,0,2); translate → (1,0,2)
    np.testing.assert_allclose(
        transform_points(pos, rot, scale, pts), [1.0, 0.0, 2.0], atol=1e-5
    )


def test_camera_convention_reference_pose():
    """The reference golden camera's local +Y must point from the camera
    toward the scene content — this pins the camera basis convention
    (derivation in ops/quat.py docstring; pose from scripts/test.py:51-56)."""
    q = jnp.array([0.913407, -0.112268, 0.047731, -0.388336])
    pos = np.array([-22.343935, -21.845375, 27.061676])
    target = np.array([0.0, 0.0, 15.0])
    to_target = target - pos
    to_target /= np.linalg.norm(to_target)
    fwd = np.asarray(quat_rotate(q, jnp.array([0.0, 1.0, 0.0])))
    assert float(np.dot(fwd, to_target)) > 0.98
    # +Z stays mostly up
    up = np.asarray(quat_rotate(q, jnp.array([0.0, 0.0, 1.0])))
    assert up[2] > 0.9
