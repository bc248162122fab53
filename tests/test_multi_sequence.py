"""Batched multi-sequence odometry on the CPU mesh (BASELINE configs[3] shrunk to CI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_graph_slam_tpu.core.config import NdtConfig, ScanMatcherConfig
from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.parallel import distributed, multi_sequence
from lidar_graph_slam_tpu.utils.evaluation import ate_rmse


@pytest.mark.slow
def test_batch_odometry_tracks_all_sequences():
    B, F, N = 4, 12, 2048
    cfg = ScanMatcherConfig(
        max_scan_accumulate_num=10,
        ndt=NdtConfig(resolution=2.0, max_iterations=32),
    )
    scans = np.full((B, F, N, 3), 1.0e6, dtype=np.float32)
    masks = np.zeros((B, F, N), dtype=bool)
    gts = []
    for b in range(B):
        seq = SyntheticSequence(n_frames=F, seed=10 + b, max_points=N, laps=0.1,
                                radius=30.0 + 2 * b)
        gt_b = []
        for f, (scan, gt_pose) in enumerate(seq):
            k = scan.shape[0]
            scans[b, f, :k] = scan
            masks[b, f, :k] = True
            gt_b.append(gt_pose)
        T0_inv = np.linalg.inv(gt_b[0])
        gts.append(np.stack([(T0_inv @ p).astype(np.float32) for p in gt_b]))

    mesh = distributed.make_mesh(4, axis="seq")
    final, outs = multi_sequence.batch_odometry(scans, masks, cfg, map_capacity=16384,
                                                mesh=mesh)
    poses = np.asarray(outs["pose"])
    assert poses.shape == (B, F, 4, 4)
    for b in range(B):
        ate = ate_rmse(poses[b], gts[b], align=False)
        traveled = np.sum(np.linalg.norm(np.diff(gts[b][:, :3, 3], axis=0), axis=1))
        assert ate < max(0.05 * traveled, 0.35), f"seq {b}: ATE {ate:.3f} over {traveled:.1f} m"
    # Keyframe counters advanced and the first frame bootstrapped everywhere.
    assert (np.asarray(final.kf_count) >= 2).all()
    assert np.asarray(outs["is_keyframe"])[:, 0].all()
