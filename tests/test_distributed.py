"""Distributed paths on the virtual 8-device CPU mesh (SURVEY.md §4's 'fake backend')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_graph_slam_tpu.core import se3
from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.graph import solver
from lidar_graph_slam_tpu.io.synthetic import make_world, simulate_scan
from lidar_graph_slam_tpu.ops.neighbors import build_hash_grid
from lidar_graph_slam_tpu.parallel import distributed


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return distributed.make_mesh(8)


def test_batched_icp_matches_single(mesh, rng=None):
    rng = np.random.default_rng(2)
    world = make_world(rng, extent=30.0, density=2.0)
    pose = np.eye(4, dtype=np.float32)
    target = simulate_scan(world, pose, rng, max_points=4096, noise=0.01)
    tc = PointCloud.from_array(target, capacity=4096)
    grid = build_hash_grid(tc.points, tc.mask, 2.0)

    B = 8
    srcs, msks, inits, trues = [], [], [], []
    for b in range(B):
        src = simulate_scan(world, pose, rng, max_points=4096, noise=0.01)
        sc = PointCloud.from_array(src, capacity=4096)
        xi = np.concatenate([rng.normal(size=3) * 0.02, rng.normal(size=3) * 0.2]).astype(np.float32)
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        moved = (T[:3, :3] @ np.asarray(sc.points).T).T + T[:3, 3]
        srcs.append(np.where(np.asarray(sc.mask)[:, None], moved, np.asarray(sc.points)))
        msks.append(np.asarray(sc.mask))
        inits.append(np.eye(4, dtype=np.float32))
        trues.append(T)

    res = distributed.batched_icp(
        mesh, grid,
        jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(msks)), jnp.asarray(np.stack(inits)),
        max_correspondence_distance=2.0, max_iterations=30,
    )
    assert res.transform.shape == (B, 4, 4)
    for b in range(B):
        err = np.asarray(se3.se3_log(res.transform[b] @ jnp.asarray(trues[b])))
        assert np.linalg.norm(err[3:]) < 0.1, f"batch {b}: {err}"


def test_distributed_graph_step_matches_single_chip(mesh):
    rng = np.random.default_rng(5)
    # Build a drifted chain + one loop factor, then compare the distributed GN step's
    # result against the single-chip solver step.
    VAR = (1e-4,) * 6
    g = solver.init_graph(32, 4, VAR)
    T = np.eye(4, dtype=np.float32)
    g = solver.graph_add_keyframe(g, jnp.asarray(T), jnp.eye(4))
    for k in range(1, 20):
        xi = np.concatenate([rng.normal(size=3) * 0.01, [1.0, 0, 0]]).astype(np.float32)
        meas = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        T = T @ meas
        g = solver.graph_add_keyframe(g, jnp.asarray(T), jnp.asarray(meas))
    g = solver.graph_add_loop(
        g, jnp.asarray(0), jnp.asarray(19),
        jnp.asarray(np.eye(4, dtype=np.float32)), jnp.full((6,), 1e4, jnp.float32),
    )

    damping = 1e-4
    poses_dist = distributed.distributed_graph_step(mesh, g, damping=damping)
    delta_single = solver._solve_step(g, g.poses, jnp.asarray(damping, jnp.float32))
    poses_single = g.poses @ se3.se3_exp(delta_single)
    np.testing.assert_allclose(
        np.asarray(poses_dist[:20]), np.asarray(poses_single[:20]), atol=5e-4
    )
    # The step must reduce the graph cost.
    assert float(solver.graph_cost(g, poses_dist)) < float(solver.graph_cost(g, g.poses))
