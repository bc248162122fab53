"""Grid-hash kNN vs. brute-force numpy oracle."""

import numpy as np
import jax.numpy as jnp

from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.ops import neighbors


def brute_knn(targets, queries, k):
    d2 = ((queries[:, None, :] - targets[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_nearest_matches_bruteforce(rng):
    targets = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    queries = rng.uniform(-9, 9, size=(200, 3)).astype(np.float32)
    tc = PointCloud.from_array(targets, capacity=2048)
    grid = neighbors.build_hash_grid(tc.points, tc.mask, 2.0)
    idx, d2, found = neighbors.nearest(grid, jnp.asarray(queries), bucket_cap=64)

    oracle_idx, oracle_d2 = brute_knn(targets, queries, 1)
    found_np = np.asarray(found)
    # Dense cloud, cell 2.0 -> every query should find its NN (oracle NN dist << cell).
    assert found_np.all()
    np.testing.assert_allclose(np.asarray(d2), oracle_d2[:, 0], atol=1e-4)


def test_knn_matches_bruteforce_with_margin(rng):
    targets = rng.uniform(0, 8, size=(1500, 3)).astype(np.float32)
    queries = targets[:100] + rng.normal(size=(100, 3)).astype(np.float32) * 0.05
    tc = PointCloud.from_array(targets, capacity=2048)
    grid = neighbors.build_hash_grid(tc.points, tc.mask, 1.5)
    k = 10
    idx, d2, valid = neighbors.knn(grid, jnp.asarray(queries), k=k, bucket_cap=64)

    _, oracle_d2 = brute_knn(targets, queries, k)
    # All k oracle neighbors lie well within one cell ring here, so distances must match.
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), oracle_d2, atol=1e-4)
    assert np.asarray(valid).all()


def test_knn_sparse_region_partial_results(rng):
    # Isolated query far from all targets: no neighbors within one cell ring.
    targets = rng.uniform(0, 4, size=(500, 3)).astype(np.float32)
    tc = PointCloud.from_array(targets, capacity=512)
    grid = neighbors.build_hash_grid(tc.points, tc.mask, 1.0)
    far_query = jnp.asarray(np.array([[50.0, 50.0, 10.0]], dtype=np.float32))
    idx, d2, valid = neighbors.knn(grid, far_query, k=5, bucket_cap=16)
    assert not np.asarray(valid).any()


def test_padded_queries_are_invalid(rng):
    targets = rng.uniform(0, 4, size=(500, 3)).astype(np.float32)
    tc = PointCloud.from_array(targets, capacity=512)
    grid = neighbors.build_hash_grid(tc.points, tc.mask, 1.0)
    qc = PointCloud.from_array(targets[:10], capacity=32)  # 22 padded rows
    idx, d2, found = neighbors.nearest(grid, qc.points, bucket_cap=64)
    found_np = np.asarray(found)
    assert found_np[:10].all()
    assert not found_np[10:].any()


def test_radius_mask(rng):
    positions = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    mask = np.ones(100, dtype=bool)
    mask[50:] = False
    query = np.zeros(3, dtype=np.float32)
    got = np.asarray(
        neighbors.radius_mask(jnp.asarray(positions), jnp.asarray(mask), jnp.asarray(query), 3.0)
    )
    oracle = (np.linalg.norm(positions, axis=1) < 3.0) & mask
    np.testing.assert_array_equal(got, oracle)
