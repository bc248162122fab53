"""FPFH features + RANSAC global registration (registration/features.py).

The capability the reference lists as TODO ("Scan Matching with FPFH", `README.md:33-39`):
recover large SE(3) offsets with no initial guess, where identity-guess ICP
(`graph_based_slam.cpp:315-318`) has no basin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.io.synthetic import make_world, simulate_scan
from lidar_graph_slam_tpu.ops.neighbors import build_hash_grid
from lidar_graph_slam_tpu.registration.features import (
    compute_fpfh,
    estimate_normals,
    global_register,
    match_features,
)


def _plane_cloud(rng, n=512, normal=(0.0, 0.0, 1.0)):
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-5, 5, n)
    pts[:, 1] = rng.uniform(-5, 5, n)
    nz = np.asarray(normal, np.float32)
    nz /= np.linalg.norm(nz)
    # Rotate the z=0 plane so its normal is `normal`.
    z = np.array([0.0, 0.0, 1.0], np.float32)
    v = np.cross(z, nz)
    s = np.linalg.norm(v)
    if s < 1e-9:
        R = np.eye(3, dtype=np.float32)
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float32)
        R = np.eye(3, dtype=np.float32) + vx + vx @ vx * ((1 - z @ nz) / s**2)
    return pts @ R.T, nz


def test_plane_normals(rng):
    pts, nz = _plane_cloud(rng, normal=(1.0, 2.0, 3.0))
    cloud = PointCloud.from_array(pts + 10.0, capacity=1024)  # offset from viewpoint
    grid = build_hash_grid(cloud.points, cloud.mask, 1.0)
    normals, ok = estimate_normals(grid, cloud.points, cloud.mask, k=12)
    normals = np.asarray(normals)[np.asarray(ok & cloud.mask)]
    # Normals are sign-flipped toward the origin viewpoint; compare up to sign.
    dots = np.abs(normals @ nz)
    assert np.mean(dots > 0.99) > 0.95


def test_fpfh_rigid_invariance(rng):
    world = make_world(rng, extent=30.0, density=3.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (5.0, 0.0, 1.5)
    scan = simulate_scan(world, pose, rng, max_points=4096, noise=0.01)
    c = np.cos(1.1); s = np.sin(1.1)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([30.0, -12.0, 2.0], np.float32)
    scan2 = scan @ R.T + t

    def feats(pts, vp):
        cloud = PointCloud.from_array(pts, capacity=4096)
        grid = build_hash_grid(cloud.points, cloud.mask, 2.0)
        nrm, _ = estimate_normals(grid, cloud.points, cloud.mask, k=16,
                                  viewpoint=jnp.asarray(vp, jnp.float32))
        f, ok = compute_fpfh(grid, cloud.points, cloud.mask, nrm, k=16)
        return np.asarray(f), np.asarray(ok)

    f1, ok1 = feats(scan, np.zeros(3))
    f2, ok2 = feats(scan2, t)  # viewpoint moves with the cloud
    both = ok1 & ok2
    # Identical point order: rigid motion (with consistent viewpoint) preserves FPFH.
    # Residual comes from grid-cell reassignment perturbing the kNN sets; the ray-cast
    # sensor's scanline pattern (dense azimuth rings, sparse elevation gaps) makes those
    # neighborhoods noisier than the old isotropic sampler's, hence 0.45 not 0.35.
    diff = np.abs(f1[both] - f2[both]).sum(axis=1)  # L1 over 33 bins, each block sums to 1
    assert np.median(diff) < 0.45


def test_match_features_identity(rng):
    f = rng.uniform(size=(64, 33)).astype(np.float32)
    valid = np.ones(64, bool)
    idx, ok = match_features(jnp.asarray(f), jnp.asarray(valid), jnp.asarray(f), jnp.asarray(valid))
    assert np.array_equal(np.asarray(idx), np.arange(64))
    assert np.asarray(ok).all()


@pytest.mark.parametrize("yaw_deg,offset", [(150.0, (18.0, -9.0, 0.3)), (75.0, (-12.0, 20.0, -0.2))])
def test_global_register_recovers_large_offset(rng, yaw_deg, offset):
    """Arbitrary-rotation loop recovery — far outside any ICP/NDT basin."""
    world = make_world(rng, extent=40.0, density=3.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (8.0, -3.0, 1.5)
    tgt = simulate_scan(world, pose, rng, max_points=8192, noise=0.015)

    a = np.deg2rad(yaw_deg)
    c, s = np.cos(a), np.sin(a)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.asarray(offset, np.float32)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R
    T_true[:3, 3] = t
    # src = T_true^{-1} applied to target points: then src -> tgt transform == T_true.
    src = (tgt - t) @ R

    src_c = PointCloud.from_array(src.astype(np.float32), capacity=8192)
    tgt_c = PointCloud.from_array(tgt, capacity=8192)
    T, n_inl, ok = global_register(
        src_c.points, src_c.mask, tgt_c.points, tgt_c.mask, tgt_viewpoint=np.zeros(3),
    )
    T = np.asarray(T)
    assert bool(ok), f"global registration failed ({int(n_inl)} inliers)"
    rot_err = np.rad2deg(
        np.arccos(np.clip((np.trace(T[:3, :3].T @ R) - 1.0) / 2.0, -1.0, 1.0))
    )
    trans_err = np.linalg.norm(T[:3, 3] - t)
    assert rot_err < 5.0, f"rotation error {rot_err:.2f} deg"
    assert trans_err < 1.0, f"translation error {trans_err:.2f} m"
