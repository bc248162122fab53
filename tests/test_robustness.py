"""Degenerate-input robustness: the engine must stay finite and keep its overflow
discipline under inputs a production deployment will eventually see (empty scans,
single-return scans, out-of-range garbage, capacity overflows). The reference's only
guard is per-frame hasConverged (`lidar_scan_matcher.cpp:167-170`); this battery pins
the stronger contract."""

import numpy as np
import pytest

from lidar_graph_slam_tpu.core.config import (
    CapacityConfig, GraphSlamConfig, PipelineConfig, PrefilterConfig,
)
from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline


def _tiny_cfg(**kw):
    return PipelineConfig(
        prefilter=PrefilterConfig(leaf_size=0.3, mean_k=10),
        graph_slam=GraphSlamConfig(loop_search_period_frames=5),
        capacity=CapacityConfig(
            raw_points=8192, filtered_points=2048, keyframe_points=2048,
            loop_submap_points=16384, max_keyframes=64, voxel_capacity=8192,
            max_loop_factors=4,
        ),
        **kw,
    )


def test_empty_and_tiny_scans_do_not_crash():
    pipe = SlamPipeline(_tiny_cfg())
    seq = SyntheticSequence(n_frames=4, seed=0, max_points=4096, laps=0.05)
    scans = [s for s, _ in seq]
    pipe.process_scan(scans[0])
    pipe.process_scan(np.zeros((0, 3), np.float32))        # empty scan
    pipe.process_scan(scans[1])
    pipe.process_scan(np.zeros((1, 3), np.float32))        # single degenerate return
    pipe.process_scan(scans[2])
    res = pipe.result()
    assert np.isfinite(res.odometry_poses).all()
    assert res.odometry_poses.shape[0] == 5


def test_garbage_scan_is_survived():
    """A scan of far-out-of-range garbage must not poison the trajectory: the health
    gate freezes the pose for that frame and tracking resumes."""
    pipe = SlamPipeline(_tiny_cfg())
    seq = SyntheticSequence(n_frames=5, seed=1, max_points=4096, laps=0.05)
    scans = [s for s, _ in seq]
    for s in scans[:3]:
        pipe.process_scan(s)
    garbage = np.full((512, 3), 4.0e5, np.float32)         # beyond every range gate
    pipe.process_scan(garbage)
    for s in scans[3:]:
        pipe.process_scan(s)
    res = pipe.result()
    assert np.isfinite(res.odometry_poses).all()
    # The garbage frame must not have teleported the pose.
    d = np.linalg.norm(np.diff(res.odometry_poses[:, :3, 3], axis=0), axis=1)
    assert d.max() < 10.0, d


def test_loop_factor_overflow_surfaced():
    """At max_loop_factors the insert is refused and surfaced, never silently
    overwritten (r02's failure mode)."""
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.graph.slam import GraphBasedSLAM
    from lidar_graph_slam_tpu.graph import solver

    cfg = _tiny_cfg()
    back = GraphBasedSLAM(cfg.graph_slam, cfg.capacity)
    rng = np.random.default_rng(0)
    for k in range(8):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (float(k), 0, 0)
        back.add_keyframe({
            "pose": T, "cloud": rng.normal(size=(64, 3)).astype(np.float32),
            "cloud_mask": np.ones(64, bool), "accum_distance": float(k),
        })
    # Fill the device graph's loop capacity directly.
    for l in range(cfg.capacity.max_loop_factors):
        back.graph = solver.graph_add_loop(
            back.graph, jnp.asarray(0), jnp.asarray(7), jnp.eye(4),
            jnp.ones((6,), jnp.float32))
        back.n_loops += 1
    assert not back.loop_overflow
    assert back.try_close_loop() is False
    assert back.loop_overflow
    assert back.loop_log and back.loop_log[-1].get("overflow")


def test_keyframe_overflow_refused():
    cfg = _tiny_cfg()
    from lidar_graph_slam_tpu.graph.slam import GraphBasedSLAM

    back = GraphBasedSLAM(cfg.graph_slam, cfg.capacity)
    rng = np.random.default_rng(0)
    for k in range(cfg.capacity.max_keyframes + 3):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (float(k), 0, 0)
        back.add_keyframe({
            "pose": T, "cloud": rng.normal(size=(16, 3)).astype(np.float32),
            "cloud_mask": np.ones(16, bool), "accum_distance": float(k),
        })
    assert back.n_keyframes == cfg.capacity.max_keyframes
    assert back.keyframe_overflow
