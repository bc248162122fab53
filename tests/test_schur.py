"""Schur-complement distributed solve vs the single-chip block-tridiagonal solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_graph_slam_tpu.core import se3
from lidar_graph_slam_tpu.graph import solver
from lidar_graph_slam_tpu.parallel import distributed, schur


@pytest.fixture(scope="module")
def mesh():
    return distributed.make_mesh(8, axis="pose")


def random_spd_tridiag(rng, K):
    """Well-conditioned random block-tridiagonal SPD system."""
    D = np.zeros((K, 6, 6), np.float32)
    U = np.zeros((K, 6, 6), np.float32)
    for k in range(K):
        A = rng.normal(size=(6, 6)).astype(np.float32) * 0.3
        D[k] = A @ A.T + 6.0 * np.eye(6, dtype=np.float32)
        if k < K - 1:
            U[k] = rng.normal(size=(6, 6)).astype(np.float32) * 0.3
    return jnp.asarray(D), jnp.asarray(U)


def dense_solve(D, U, B):
    K = D.shape[0]
    H = np.zeros((K * 6, K * 6), np.float64)
    for k in range(K):
        H[6 * k:6 * k + 6, 6 * k:6 * k + 6] = np.asarray(D[k])
        if k < K - 1:
            H[6 * k:6 * k + 6, 6 * k + 6:6 * k + 12] = np.asarray(U[k])
            H[6 * k + 6:6 * k + 12, 6 * k:6 * k + 6] = np.asarray(U[k]).T
    return np.linalg.solve(H, np.asarray(B).reshape(K * 6, -1)).reshape(K, 6, -1)


def test_schur_tridiag_matches_dense(mesh, rng):
    K, M = 32, 3
    D, U = random_spd_tridiag(rng, K)
    B = jnp.asarray(rng.normal(size=(K, 6, M)).astype(np.float32))
    x = schur.schur_tridiag_solve(mesh, D, U, B)
    x_dense = dense_solve(D, U, B)
    np.testing.assert_allclose(np.asarray(x), x_dense, rtol=2e-3, atol=2e-4)


def test_schur_tridiag_matches_single_chip_impl(mesh, rng):
    K, M = 64, 5
    D, U = random_spd_tridiag(rng, K)
    B = jnp.asarray(rng.normal(size=(K, 6, M)).astype(np.float32))
    x_schur = schur.schur_tridiag_solve(mesh, D, U, B)
    x_seq = solver._tridiag_solve(D, U[: K - 1], B)
    np.testing.assert_allclose(np.asarray(x_schur), np.asarray(x_seq), rtol=2e-3, atol=2e-4)


def test_schur_graph_step_matches_single_chip(mesh):
    rng = np.random.default_rng(9)
    g = solver.init_graph(32, 4, (1e-4,) * 6)
    T = np.eye(4, dtype=np.float32)
    g = solver.graph_add_keyframe(g, jnp.asarray(T), jnp.eye(4))
    for k in range(1, 24):
        xi = np.concatenate([rng.normal(size=3) * 0.01, [1.0, 0, 0.1]]).astype(np.float32)
        meas = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        T = T @ meas
        g = solver.graph_add_keyframe(g, jnp.asarray(T), jnp.asarray(meas))
    g = solver.graph_add_loop(
        g, jnp.asarray(2), jnp.asarray(23), jnp.asarray(np.eye(4, dtype=np.float32)),
        jnp.full((6,), 1e4, jnp.float32),
    )

    damping = 1e-4
    poses_schur = schur.schur_graph_step(mesh, g, damping=damping)
    delta = solver._solve_step(g, g.poses, jnp.asarray(damping, jnp.float32))
    poses_single = g.poses @ se3.se3_exp(delta)
    # Single-STEP tolerance: on this deliberately ill-conditioned graph (info up to
    # 1e8) the Schur domain decomposition and the single-chip cyclic reduction take
    # different f32 elimination orders, so one damped-GN step wobbles at the few-1e-3
    # level; at LM CONVERGENCE both land on the same optimum to ~3e-4 m (asserted
    # end-to-end by tests/test_pipeline_mesh.py).
    np.testing.assert_allclose(
        np.asarray(poses_schur[:24]), np.asarray(poses_single[:24]), atol=5e-3
    )
    assert float(solver.graph_cost(g, poses_schur)) < float(solver.graph_cost(g, g.poses))
