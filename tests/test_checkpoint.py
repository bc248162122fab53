"""Checkpoint/resume: a resumed pipeline must continue like the original.

With the classic (synchronous) driver, resume is EXACT. With the fused driver, the one-
frame submap lag collapses at the checkpoint boundary (flush() drains in-flight frames and
rebuilds the target), so the resumed trajectory may differ by a bounded, damped amount —
asserted small, and the keyframe schedule must match.
"""

from dataclasses import replace

import numpy as np
import pytest

from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline
from lidar_graph_slam_tpu.utils import checkpoint
from tests.test_pipeline import small_config


def _resume_run(cfg, tmp_path):
    n = 24
    seq = SyntheticSequence(n_frames=n, seed=6, max_points=4096, laps=0.25)
    scans = [s for s, _ in seq]

    pipe_a = SlamPipeline(cfg)
    for s in scans:
        pipe_a.process_scan(s)
    res_a = pipe_a.result()

    pipe_b = SlamPipeline(cfg)
    for s in scans[: n // 2]:
        pipe_b.process_scan(s)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_pipeline(pipe_b, ckpt)
    pipe_c = checkpoint.load_pipeline(ckpt)
    for s in scans[n // 2:]:
        pipe_c.process_scan(s)
    return res_a, pipe_c.result()


@pytest.mark.slow
def test_checkpoint_exact_resume(tmp_path):
    cfg = replace(small_config(), fused_frontend=False)
    res_a, res_c = _resume_run(cfg, tmp_path)
    assert res_c.odometry_poses.shape == res_a.odometry_poses.shape
    np.testing.assert_allclose(
        res_c.odometry_poses, res_a.odometry_poses, atol=1e-4,
        err_msg="resumed odometry diverged from the continuous run",
    )
    assert res_c.keyframe_poses.shape == res_a.keyframe_poses.shape
    np.testing.assert_allclose(res_c.keyframe_poses, res_a.keyframe_poses, atol=1e-4)
    np.testing.assert_array_equal(res_c.keyframe_frame_indices, res_a.keyframe_frame_indices)


@pytest.mark.slow
def test_checkpoint_resume_fused(tmp_path):
    cfg = replace(small_config(), fused_frontend=True)
    res_a, res_c = _resume_run(cfg, tmp_path)
    assert res_c.odometry_poses.shape == res_a.odometry_poses.shape
    # Bounded difference from the lag collapse at the checkpoint cut; must stay small
    # (the odometry loop damps perturbations) and the keyframe schedule must agree.
    np.testing.assert_allclose(res_c.odometry_poses, res_a.odometry_poses, atol=5e-2)
    np.testing.assert_array_equal(res_c.keyframe_frame_indices, res_a.keyframe_frame_indices)


@pytest.mark.slow
def test_checkpoint_preserves_config(tmp_path):
    from lidar_graph_slam_tpu.core.config import apply_cli_overrides

    cfg = apply_cli_overrides(
        replace(small_config(), fused_frontend=False), ["scan_matcher.displacement=2.5"]
    )
    pipe = SlamPipeline(cfg)
    seq = SyntheticSequence(n_frames=6, seed=7, max_points=4096, laps=0.1)
    for s, _ in seq:
        pipe.process_scan(s)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_pipeline(pipe, ckpt)
    pipe2 = checkpoint.load_pipeline(ckpt)
    assert pipe2.cfg.scan_matcher.displacement == 2.5
    assert pipe2.front.n_frames == 6
