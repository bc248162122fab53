"""Fused single-dispatch front end vs the classic stage-by-stage driver.

The fused driver (odometry/fused.py) must produce the same trajectory as the classic
driver: same math, different program packaging plus a one-frame submap lag (verified
benign). This test also guards the stability property that motivated the final design —
the closed odometry loop must damp FP-level program differences rather than amplify them
(see the fused.py docstring for the instability post-mortem).
"""

from dataclasses import replace

import numpy as np
import pytest

from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline
from tests.test_pipeline import small_config


@pytest.mark.slow
def test_fused_matches_classic_trajectory():
    n = 40
    seq = SyntheticSequence(n_frames=n, seed=3, max_points=8192, radius=30.0, laps=1.1 * n / 90)
    scans = [np.asarray(s[0] if isinstance(s, tuple) else s) for s in seq]
    T0_inv = np.linalg.inv(seq.poses[0])
    gt = np.stack([(T0_inv @ p).astype(np.float32) for p in seq.poses])

    results = {}
    for fused in (False, True):
        cfg = replace(small_config(), fused_frontend=fused, enable_loop_closure=False)
        pipe = SlamPipeline(cfg)
        for s in scans:
            pipe.process_scan(s)
        results[fused] = pipe.result()

    a, b = results[False].odometry_poses, results[True].odometry_poses
    assert a.shape == b.shape == (n, 4, 4)

    # Both drivers track ground truth.
    for fused, r in results.items():
        err = np.linalg.norm(r.odometry_poses[:, :3, 3] - gt[:, :3, 3], axis=1)
        assert err.max() < 1.0, f"fused={fused} lost tracking: max err {err.max():.3f}"

    # And each other (bounded difference: program rounding through a damped loop).
    d = np.linalg.norm(a[:, :3, 3] - b[:, :3, 3], axis=1)
    assert d.max() < 0.5, f"fused diverged from classic: {d.max():.3f}"

    # Same keyframe schedule.
    np.testing.assert_array_equal(
        results[False].keyframe_frame_indices, results[True].keyframe_frame_indices
    )


def test_fused_lagged_output_semantics():
    """process_scan returns the PREVIOUS frame's record in fused mode; result() drains."""
    cfg = replace(small_config(), enable_loop_closure=False)
    seq = SyntheticSequence(n_frames=5, seed=1, max_points=4096, laps=0.05)
    pipe = SlamPipeline(cfg)
    for s, _ in seq:
        out = pipe.process_scan(s)
        assert set(out) >= {"pose", "is_keyframe", "converged", "fitness", "iterations"}
    res = pipe.result()
    assert res.odometry_poses.shape[0] == 5
    # Frame 0 is the bootstrap keyframe (reference `:133-160`).
    assert res.keyframe_frame_indices[0] == 0
