"""Checkpoint/resume: a resumed pipeline must continue exactly like the original."""

import numpy as np
import pytest

from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline
from lidar_graph_slam_tpu.utils import checkpoint
from tests.test_pipeline import small_config


@pytest.mark.slow
def test_checkpoint_exact_resume(tmp_path):
    n = 24
    seq = SyntheticSequence(n_frames=n, seed=6, max_points=4096, laps=0.25)
    scans = [s for s, _ in seq]

    # Continuous run.
    pipe_a = SlamPipeline(small_config())
    for s in scans:
        pipe_a.process_scan(s)
    res_a = pipe_a.result()

    # Run half, checkpoint, resume, run the rest.
    pipe_b = SlamPipeline(small_config())
    for s in scans[: n // 2]:
        pipe_b.process_scan(s)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_pipeline(pipe_b, ckpt)
    pipe_c = checkpoint.load_pipeline(ckpt)
    for s in scans[n // 2:]:
        pipe_c.process_scan(s)
    res_c = pipe_c.result()

    assert res_c.odometry_poses.shape == res_a.odometry_poses.shape
    np.testing.assert_allclose(
        res_c.odometry_poses, res_a.odometry_poses, atol=1e-4,
        err_msg="resumed odometry diverged from the continuous run",
    )
    assert res_c.keyframe_poses.shape == res_a.keyframe_poses.shape
    np.testing.assert_allclose(res_c.keyframe_poses, res_a.keyframe_poses, atol=1e-4)
    np.testing.assert_array_equal(res_c.keyframe_frame_indices, res_a.keyframe_frame_indices)


@pytest.mark.slow
def test_checkpoint_preserves_config(tmp_path):
    from lidar_graph_slam_tpu.core.config import apply_cli_overrides

    cfg = apply_cli_overrides(small_config(), ["scan_matcher.displacement=2.5"])
    pipe = SlamPipeline(cfg)
    seq = SyntheticSequence(n_frames=6, seed=7, max_points=4096, laps=0.1)
    for s, _ in seq:
        pipe.process_scan(s)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_pipeline(pipe, ckpt)
    pipe2 = checkpoint.load_pipeline(ckpt)
    assert pipe2.cfg.scan_matcher.displacement == 2.5
    assert pipe2.front.n_frames == 6
