"""End-to-end odometry on a synthetic sequence: drift must stay bounded.

This is the engine's analog of BASELINE.json configs[0] ("KITTI 00 short clip: scan-to-scan
NDT odometry, CPU jax") — shrunk to CI scale on the synthetic world.
"""

import numpy as np
import pytest

from lidar_graph_slam_tpu.core.config import ScanMatcherConfig, NdtConfig
from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.odometry.scan_matcher import ScanMatcher
from lidar_graph_slam_tpu.utils.evaluation import ate_rmse, rpe


def run_odometry(cfg, n_frames=30, capacity=4096, seed=0, laps=0.25):
    seq = SyntheticSequence(n_frames=n_frames, seed=seed, max_points=capacity, laps=laps)
    sm = ScanMatcher(cfg, scan_capacity=capacity, map_voxel_capacity=32768)
    est, gt = [], []
    # Feed poses relative to the first ground-truth pose so est/gt share a start frame.
    T0_inv = np.linalg.inv(seq.poses[0])
    for scan, gt_pose in seq:
        cloud = PointCloud.from_array(scan, capacity=capacity)
        out = sm.process(cloud)
        est.append(out["pose"])
        gt.append((T0_inv @ gt_pose).astype(np.float32))
    return np.stack(est), np.stack(gt), sm


@pytest.mark.slow
def test_ndt_odometry_bounded_drift():
    cfg = ScanMatcherConfig(registration_method="NDT", displacement=1.0,
                            ndt=NdtConfig(resolution=2.0, max_iterations=48))
    est, gt, sm = run_odometry(cfg, n_frames=30)
    traveled = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    ate = ate_rmse(est, gt, align=False)
    # Bounded drift: < 3% of distance traveled without loop closure.
    assert ate < max(0.03 * traveled, 0.3), f"ATE {ate:.3f} over {traveled:.1f} m"
    assert sm.n_keyframes >= 3
    t_rpe, r_rpe = rpe(est, gt)
    assert t_rpe < 0.25


@pytest.mark.slow
def test_keyframe_displacement_trigger():
    cfg = ScanMatcherConfig(registration_method="NDT", displacement=2.0,
                            ndt=NdtConfig(max_iterations=32))
    est, gt, sm = run_odometry(cfg, n_frames=20, laps=0.2)
    # Keyframes must be >= displacement apart (approximately, allowing estimate noise).
    kf_poses = np.stack([k["pose"] for k in sm.keyframe_log])
    gaps = np.linalg.norm(np.diff(kf_poses[:, :3, 3], axis=0), axis=1)
    assert (gaps > 1.5).all()
    # Keyframe log carries monotone accumulated distance (`lidar_scan_matcher.cpp:185`).
    accum = [k["accum_distance"] for k in sm.keyframe_log]
    assert all(b > a for a, b in zip(accum, accum[1:]))


@pytest.mark.slow
def test_gicp_odometry_bounded_drift():
    cfg = ScanMatcherConfig(registration_method="GICP")
    est, gt, sm = run_odometry(cfg, n_frames=15, laps=0.12)
    ate = ate_rmse(est, gt, align=False)
    traveled = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    assert ate < max(0.05 * traveled, 0.4), f"GICP ATE {ate:.3f} over {traveled:.1f} m"


@pytest.mark.slow
def test_icp_odometry_bounded_drift():
    cfg = ScanMatcherConfig(registration_method="ICP")
    est, gt, sm = run_odometry(cfg, n_frames=15, laps=0.12)
    ate = ate_rmse(est, gt, align=False)
    traveled = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    assert ate < max(0.05 * traveled, 0.4), f"ICP ATE {ate:.3f} over {traveled:.1f} m"


@pytest.mark.slow
def test_extrinsic_applied():
    # A yaw extrinsic on sensor scans must leave the (base-frame) trajectory unchanged:
    # scans rotated into base cancel the rotation we inject into the raw data.
    import jax.numpy as jnp
    from lidar_graph_slam_tpu.core import se3 as se3m

    yaw = 0.4
    cfg_plain = ScanMatcherConfig()
    cfg_ext = ScanMatcherConfig(extrinsic_xyzrpy=(0.0, 0.0, 0.0, 0.0, 0.0, yaw))
    seq = SyntheticSequence(n_frames=8, seed=12, max_points=2048, laps=0.06)
    scans = [s for s, _ in seq]
    Rz = np.asarray(se3m.so3_exp(jnp.asarray([0, 0, -yaw], dtype=jnp.float32)))

    sm_a = ScanMatcher(cfg_plain, scan_capacity=2048, map_voxel_capacity=16384)
    sm_b = ScanMatcher(cfg_ext, scan_capacity=2048, map_voxel_capacity=16384)
    for s in scans:
        a = sm_a.process(PointCloud.from_array(s, capacity=2048))
        # Rotate the raw scan by the inverse extrinsic; the configured extrinsic undoes it.
        b = sm_b.process(PointCloud.from_array(s @ Rz.T, capacity=2048))
    np.testing.assert_allclose(a["pose"][:3, 3], b["pose"][:3, 3], atol=0.05)


@pytest.mark.slow
def test_dynamic_extrinsic_provider():
    """A time-varying extrinsic provider (the reference's per-frame TF lookup,
    `lidar_scan_matcher.cpp:252-273`) must undo a per-frame sensor rotation in BOTH
    drivers; a provider returning None falls back like a failed TF lookup."""
    import jax.numpy as jnp
    from lidar_graph_slam_tpu.core import se3 as se3m
    from lidar_graph_slam_tpu.core.config import CapacityConfig, PipelineConfig, PrefilterConfig
    from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline

    seq = SyntheticSequence(n_frames=8, seed=12, max_points=2048, laps=0.06)
    scans = [s for s, _ in seq]
    yaws = [0.1 * i for i in range(len(scans))]   # time-varying mount rotation

    def provider(stamp):
        if stamp is None:
            return None  # TF-lookup miss -> identity fallback
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(se3m.so3_exp(jnp.asarray([0, 0, yaws[int(stamp)]], jnp.float32)))
        return T

    cap = CapacityConfig(raw_points=8192, filtered_points=2048, keyframe_points=2048,
                         max_keyframes=64, voxel_capacity=16384,
                         loop_submap_points=16384, max_loop_factors=4)
    base = dict(prefilter=PrefilterConfig(leaf_size=0.3, mean_k=10), capacity=cap,
                enable_loop_closure=False)
    for fused in (True, False):
        cfg = PipelineConfig(fused_frontend=fused, **base)
        pipe_plain = SlamPipeline(cfg)
        pipe_dyn = SlamPipeline(cfg, extrinsic_provider=provider)
        for i, s in enumerate(scans):
            a = pipe_plain.process_scan(s, stamp=float(i))
            Rz_inv = provider(float(i))[:3, :3].T
            b = pipe_dyn.process_scan(s @ Rz_inv.T, stamp=float(i))
        ra = pipe_plain.result().odometry_poses
        rb = pipe_dyn.result().odometry_poses
        np.testing.assert_allclose(ra[-1][:3, 3], rb[-1][:3, 3], atol=0.05,
                                   err_msg=f"fused={fused}")


def test_map_build_stride_validated():
    import pytest

    from lidar_graph_slam_tpu.odometry.scan_matcher import assemble_submap, init_ring

    ring = init_ring(2, 16)
    with pytest.raises(ValueError, match="map_build_stride"):
        assemble_submap(ring, stride=0)
