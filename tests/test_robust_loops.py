"""Robust loop factors: a fitness-passing-but-WRONG loop factor must not corrupt
the trajectory, while genuine factors keep their full correcting power.

The reference has no robustness at all — its loop noise is the naive fitness*I6
(`graph_based_slam/src/graph_based_slam.cpp:335-341`), so one bad ICP verification
below the 0.3 gate rewrites the whole map. The engine's f64 solve tier applies a
REDESCENDING Geman-McClure kernel on the PHYSICAL 6-dof loop residual (rotation
scaled at 5 m/rad; IRLS, `refine64._loop_weights` — Huber's linear tail was
measured insufficient: it keeps a constant pull toward the poison);
`loop_robust_delta=0` restores exact reference parity.
"""

import numpy as np

from lidar_graph_slam_tpu.graph import refine64


def _circle_view(K=256, drift_xi=None, robust_delta=0.0):
    """Odometry chain around a circle; optional per-step drift injection."""
    step = 2 * np.pi / K
    xi = np.tile(np.array([0, 0, step, 1.0, 0, 0]), (K, 1))
    meas_gt = refine64.se3_exp(xi)
    if drift_xi is not None:
        xi_d = xi + drift_xi
        meas = refine64.se3_exp(xi_d)
    else:
        meas = meas_gt
    poses = np.empty((K, 4, 4))
    gt = np.empty((K, 4, 4))
    odoms = np.empty((K, 4, 4))
    T, Tg = np.eye(4), np.eye(4)
    poses[0], odoms[0], gt[0] = T, np.eye(4), Tg
    for k in range(1, K):
        T = T @ meas[k]
        Tg = Tg @ meas_gt[k]
        poses[k], odoms[k], gt[k] = T, meas[k], Tg
    view = refine64.GraphView(
        poses, odoms, np.eye(4), 1.0 / np.array([1e-6] * 3 + [1e-8, 1e-8, 1e-6]),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros((0, 4, 4)), np.zeros((0, 6)), robust_delta=robust_delta)
    return view, gt


def _add_loop(view, i, j, Z, fitness):
    view.loop_i = np.append(view.loop_i, i)
    view.loop_j = np.append(view.loop_j, j)
    view.loop_meas = np.concatenate([view.loop_meas, Z[None]], axis=0)
    view.loop_info = np.concatenate(
        [view.loop_info, np.full((1, 6), 1.0 / fitness)], axis=0)


def _ate(poses, gt):
    return float(np.sqrt(np.mean(
        np.sum((poses[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=-1))))


def test_poisoned_loop_rejected_by_robust_kernel():
    """An adversarial factor (great fitness, wrong transform) drags the naive solve
    but is neutralized by the robust kernel."""
    results = {}
    for delta in (0.0, 5.0):
        view, gt = _circle_view(robust_delta=delta)
        # Wrong measurement: claims keyframes 20 and 148 coincide (they are ~diameter
        # apart on the circle) with excellent fitness 0.01 -> info 1e2 per dim.
        _add_loop(view, 20, 148, np.eye(4), fitness=0.01)
        poses, info = refine64.refine(view, max_iterations=20)
        results[delta] = _ate(poses, gt)
    # The stiff odometry chain already resists somewhat (naive ~0.4 m); the robust
    # kernel must make the poison essentially invisible (sub-millimeter).
    assert results[0.0] > 0.2, f"naive solve should be corrupted: {results}"
    assert results[5.0] < 0.02, f"robust solve should hold the trajectory: {results}"
    assert results[5.0] < 0.05 * results[0.0], results


def test_genuine_loop_keeps_full_power_under_robust_kernel():
    """A correct loop factor on a drifted chain must correct the drift equally well
    with the robust kernel active (IRLS weight recovers to ~1 at the optimum)."""
    rng = np.random.default_rng(3)
    drift = np.zeros((256, 6))
    drift[:, 3] = 2e-3          # forward bias -> accumulating drift
    drift[:, 2] = 1e-4
    ates = {}
    for delta in (0.0, 5.0):
        view, gt = _circle_view(drift_xi=drift, robust_delta=delta)
        ate_before = _ate(view.poses, gt)
        # Genuine measurements from ground truth between a few far pairs.
        for (i, j) in [(10, 130), (40, 170), (80, 220)]:
            Z = refine64.inverse(gt[i]) @ gt[j]
            _add_loop(view, i, j, Z, fitness=0.05)
        poses, info = refine64.refine(view, max_iterations=25)
        ates[delta] = _ate(poses, gt)
        assert ates[delta] < 0.5 * ate_before, (delta, ates[delta], ate_before)
    # The redescending kernel must not cost correcting power on genuine loops
    # (within 20%): IRLS recovers w -> 1 as a genuine residual closes.
    assert ates[5.0] <= ates[0.0] * 1.2 + 1e-3, ates


def test_mixed_good_and_poisoned_loops():
    """With both kinds present the robust solve keeps the genuine correction AND
    rejects the poison — the realistic failure mode a 0.3 fitness gate lets through."""
    drift = np.zeros((256, 6))
    drift[:, 3] = 2e-3
    drift[:, 2] = 1e-4          # yaw bias — the drift mode loop closure corrects
    view, gt = _circle_view(drift_xi=drift, robust_delta=5.0)
    ate_before = _ate(view.poses, gt)
    for (i, j) in [(10, 130), (80, 220)]:
        Z = refine64.inverse(gt[i]) @ gt[j]
        _add_loop(view, i, j, Z, fitness=0.05)
    _add_loop(view, 30, 158, np.eye(4), fitness=0.02)   # poison
    poses, info = refine64.refine(view, max_iterations=25)
    ate_after = _ate(poses, gt)
    assert ate_after < 0.5 * ate_before, (ate_after, ate_before)


def test_poisoned_loop_neutralized_through_backend():
    """Defense-in-depth at the GraphBasedSLAM level: a gate-passing-but-WRONG factor
    injected through the back end's own insertion path (the reference's
    `graph_based_slam.cpp:330-341` flow) must not corrupt `optimized_poses()` — the
    default redescending kernel rides `_run_optimize`'s f64 solve, not just the
    solver-level API the other tests exercise."""
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core.config import CapacityConfig, GraphSlamConfig
    from lidar_graph_slam_tpu.graph.slam import GraphBasedSLAM
    from lidar_graph_slam_tpu.graph import solver

    K = 64
    step = 2 * np.pi / K
    meas = refine64.se3_exp(np.tile(np.array([0, 0, step, 1.0, 0, 0]), (K, 1)))
    rng = np.random.default_rng(1)
    back = GraphBasedSLAM(
        GraphSlamConfig(async_backend=False),
        CapacityConfig(max_keyframes=K, max_loop_factors=8, keyframe_points=256),
    )
    T = np.eye(4)
    gt = []
    for k in range(K):
        if k:
            T = T @ meas[k]
        gt.append(T.copy())
        back.add_keyframe({
            "pose": T.astype(np.float32),
            "cloud": rng.normal(size=(64, 3)).astype(np.float32),
            "cloud_mask": np.ones(64, bool),
            "accum_distance": float(k) * step,
        })
    # Poison: claims keyframes 10 and 42 coincide (they are ~a diameter apart) with
    # excellent fitness 0.01 -> info 100/dof, exactly as _consume_verify would insert.
    Z = jnp.eye(4)
    info = jnp.full((6,), 100.0, jnp.float32)
    back.graph = solver.graph_add_loop(
        back.graph, jnp.asarray(10), jnp.asarray(42), Z, info)
    back._host_loops.append((10, 42, np.eye(4), np.full(6, 100.0)))
    back.n_loops += 1
    back._run_optimize()
    est = back.optimized_poses()
    err = np.linalg.norm(est[:, :3, 3] - np.stack(gt)[:, :3, 3], axis=1)
    assert err.max() < 0.05, f"poisoned factor corrupted the backend: {err.max():.3f} m"
