"""SE(3)/SO(3) algebra: round trips, group laws, conversion parity with scipy-free oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_graph_slam_tpu.core import se3


def random_rotations(rng, n):
    """Uniform-ish random rotations via quaternion normalization."""
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return se3.quat_to_matrix(jnp.asarray(q, dtype=jnp.float32))


def random_transforms(rng, n, trans_scale=10.0):
    R = random_rotations(rng, n)
    t = jnp.asarray(rng.normal(size=(n, 3)) * trans_scale)
    return se3.make_transform(R, t)


def test_so3_exp_log_roundtrip(rng):
    # Only twists with ||w|| < pi are canonical, so sample axis * angle directly.
    axis = rng.normal(size=(64, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0.0, 3.0, size=(64, 1))
    w = jnp.asarray(axis * angle)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=5e-5)


def test_so3_log_exp_consistency_large_angles(rng):
    # For arbitrary rotations, exp(log(R)) must reproduce R even when inputs wrap past pi.
    w = jnp.asarray(rng.normal(size=(64, 3)) * 2.5)
    R = se3.so3_exp(w)
    R2 = se3.so3_exp(se3.so3_log(R))
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_so3_small_angle(rng):
    w = jnp.asarray(rng.normal(size=(16, 3)) * 1e-8)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-7)
    np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.asarray(w), atol=1e-7)


def test_so3_log_near_pi(rng):
    # Rotations with angle close to pi exercise the diagonal extraction branch.
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angles = np.pi - np.abs(rng.normal(size=(32, 1))) * 1e-5
    w = jnp.asarray(axis * angles)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    # Compare rotations (log may flip axis sign at exactly pi). f32 sqrt near zero caps
    # achievable precision at ~1e-3 here.
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-3)


def test_se3_exp_log_roundtrip(rng):
    axis = rng.normal(size=(64, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0.0, 3.0, size=(64, 1))
    v = rng.normal(size=(64, 3)) * 5.0
    xi = jnp.asarray(np.concatenate([axis * angle, v], axis=-1))
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-4)


def test_group_laws(rng):
    A = random_transforms(rng, 8)
    B = random_transforms(rng, 8)
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(se3.compose(A, se3.inverse(A))), eye, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(se3.compose(A, se3.between(A, B))), np.asarray(B), atol=1e-5
    )


def test_transform_points(rng):
    T = random_transforms(rng, 1)[0]
    pts = jnp.asarray(rng.normal(size=(100, 3)) * 5.0)
    out = se3.transform_points(T, pts)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    q = rng.normal(size=(128, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign
    R = se3.quat_to_matrix(jnp.asarray(q))
    q2 = se3.matrix_to_quat(R)
    np.testing.assert_allclose(q, np.asarray(q2), atol=1e-6)


def test_pose7_roundtrip(rng):
    T = random_transforms(rng, 16)
    p7 = se3.matrix_to_pose7(T)
    T2 = se3.pose7_to_matrix(p7)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=1e-5)


def test_euler_quat_roundtrip(rng):
    rpy = jnp.asarray(rng.uniform(-1.4, 1.4, size=(32, 3)))
    q = se3.euler_to_quat(rpy)
    rpy2 = se3.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(rpy), np.asarray(rpy2), atol=1e-5)


def test_adjoint_identity(rng):
    # Adj(T) @ xi == log(T exp(xi) T^-1) for small xi.
    T = random_transforms(rng, 4)
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 1e-3)
    lhs = (se3.adjoint(T) @ xi[..., None])[..., 0]
    rhs = se3.se3_log(T @ se3.se3_exp(xi) @ se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-5)


def test_orthonormalize(rng):
    R = np.asarray(random_rotations(rng, 8))
    noisy = jnp.asarray(R + rng.normal(size=R.shape) * 1e-3)
    R2 = np.asarray(se3.orthonormalize(noisy))
    np.testing.assert_allclose(R2 @ np.swapaxes(R2, -1, -2), np.broadcast_to(np.eye(3), R2.shape), atol=1e-5)
    assert np.allclose(np.linalg.det(R2), 1.0, atol=1e-5)
