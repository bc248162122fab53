"""IMU-assisted initial guess (the reference's dormant hooks, made functional)."""

import numpy as np
import pytest

from lidar_graph_slam_tpu.core.config import ScanMatcherConfig
from lidar_graph_slam_tpu.core.pointcloud import PointCloud
from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.odometry.scan_matcher import ScanMatcher
from lidar_graph_slam_tpu.utils.evaluation import ate_rmse


def test_imu_rotation_integration():
    sm = ScanMatcher(ScanMatcherConfig(), scan_capacity=512)
    sm.last_scan_stamp = 0.0
    # 0.5 s of 0.2 rad/s yaw.
    for i in range(1, 6):
        sm.add_imu(i * 0.1, [0.0, 0.0, 0.2])
    delta = sm._imu_rotation_delta(0.5)
    assert delta is not None
    yaw = np.arctan2(delta[1, 0], delta[0, 0])
    np.testing.assert_allclose(yaw, 0.1, atol=1e-5)


def test_imu_empty_queue_is_noop():
    sm = ScanMatcher(ScanMatcherConfig(), scan_capacity=512)
    sm.last_scan_stamp = 0.0
    assert sm._imu_rotation_delta(0.5) is None


@pytest.mark.slow
def test_odometry_with_imu_stamps():
    # Feeding stamps + consistent gyro must not hurt tracking.
    n, cap = 12, 4096
    seq = SyntheticSequence(n_frames=n, seed=2, max_points=cap, laps=0.1)
    sm = ScanMatcher(ScanMatcherConfig(), scan_capacity=cap, map_voxel_capacity=32768)
    T0_inv = np.linalg.inv(seq.poses[0])
    # Ground-truth yaw rate of the circular path.
    import jax.numpy as jnp
    from lidar_graph_slam_tpu.core import se3

    est, gt = [], []
    dt = 0.1
    prev_gt = None
    for i, (scan, gt_pose) in enumerate(seq):
        rel = (T0_inv @ gt_pose).astype(np.float32)
        if prev_gt is not None:
            dR = np.asarray(se3.so3_log(jnp.asarray(
                (np.linalg.inv(prev_gt) @ rel)[:3, :3]))) / dt
            sm.add_imu(i * dt - 0.05, dR)
            sm.add_imu(i * dt, dR)
        out = sm.process(PointCloud.from_array(scan, capacity=cap), stamp=i * dt)
        est.append(out["pose"])
        gt.append(rel)
        prev_gt = rel
    ate = ate_rmse(np.stack(est), np.stack(gt), align=False)
    assert ate < 0.35, f"IMU-assisted odometry ATE {ate}"
