"""Prefilter pipeline vs. reference semantics (`points_prefiltering.cpp:65-140`)."""

import numpy as np
import jax.numpy as jnp

from lidar_graph_slam_tpu.core.config import PrefilterConfig
from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.filters import prefilter


def make_scan(rng, n=2000):
    """Ring-like LiDAR-ish scan with some near-sensor and stray points."""
    theta = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(2.0, 30.0, n)
    z = rng.uniform(-1.5, 1.5, n)
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1).astype(np.float32)


def test_distance_filter(rng):
    pts = np.array([[0.5, 0, 0], [2.0, 0, 0], [0, 0.9, 0], [10, 0, 0]], dtype=np.float32)
    cloud = PointCloud.from_array(pts, capacity=8)
    keep = prefilter.distance_filter(cloud.points, cloud.mask, 1.0)
    np.testing.assert_array_equal(np.asarray(keep)[:4], [False, True, False, True])
    # max_distance enabled drops the far point too.
    keep2 = prefilter.distance_filter(cloud.points, cloud.mask, 1.0, 5.0)
    np.testing.assert_array_equal(np.asarray(keep2)[:4], [False, True, False, False])


def test_crop_filter(rng):
    pts = np.array([[0, 0, 0], [6, 0, 0], [-6, 0, 0], [0, 0, 3]], dtype=np.float32)
    cloud = PointCloud.from_array(pts, capacity=8)
    keep = prefilter.crop_filter(cloud.points, cloud.mask, (-5, -5, -5), (5, 5, 5))
    np.testing.assert_array_equal(np.asarray(keep)[:4], [True, False, False, True])


def test_statistical_outlier_removal(rng):
    # Dense cluster + one stray point far away: SOR must kill the stray.
    cluster = rng.normal(size=(500, 3)).astype(np.float32) * 0.5
    stray = np.array([[4.5, 4.5, 0.0]], dtype=np.float32)
    pts = np.concatenate([cluster, stray])
    cloud = PointCloud.from_array(pts, capacity=512)
    keep = prefilter.statistical_outlier_mask(
        cloud.points, cloud.mask, mean_k=20, stddev_mult=jnp.float32(1.0), cell_size=5.0,
        window=64,
    )
    keep_np = np.asarray(keep)
    assert not keep_np[500]           # stray dropped
    assert keep_np[:500].mean() > 0.8  # bulk of cluster survives


def test_random_sample_mask(rng):
    pts = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    cloud = PointCloud.from_array(pts, capacity=512)
    import jax

    keep = prefilter.random_sample_mask(cloud.points, cloud.mask, 100, jax.random.PRNGKey(1))
    assert int(np.asarray(keep).sum()) == 100
    assert not np.asarray(keep)[300:].any()


def test_full_prefilter_pipeline(rng):
    scan = make_scan(rng, 4000)
    near = rng.normal(size=(50, 3)).astype(np.float32) * 0.2  # inside min_distance
    pts = np.concatenate([scan, near])
    cloud = PointCloud.from_array(pts, capacity=8192)

    cfg = PrefilterConfig(leaf_size=0.5, mean_k=10)
    fn = prefilter.make_prefilter(cfg, capacity_out=4096, voxel_capacity=8192)
    out = fn(cloud.points, cloud.mask)

    got = out.to_array()
    assert got.shape[0] > 100
    ranges = np.linalg.norm(got, axis=1)
    assert ranges.min() > cfg.min_distance * 0.9  # near-sensor points gone
    # Output must be compacted: valid rows contiguous at the front.
    mask = np.asarray(out.mask)
    first_invalid = mask.argmin() if not mask.all() else len(mask)
    assert not mask[first_invalid:].any()


def test_prefilter_deterministic(rng):
    scan = make_scan(rng, 1000)
    cloud = PointCloud.from_array(scan, capacity=2048)
    cfg = PrefilterConfig(leaf_size=0.4, mean_k=10)
    fn = prefilter.make_prefilter(cfg, capacity_out=2048, voxel_capacity=4096)
    a = fn(cloud.points, cloud.mask)
    b = fn(cloud.points, cloud.mask)
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
