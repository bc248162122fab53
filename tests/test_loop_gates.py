"""Back-end loop-detection gates (`graph_based_slam.cpp:264-280`) in isolation."""

import numpy as np
import jax.numpy as jnp

from lidar_graph_slam_tpu.core.config import CapacityConfig, GraphSlamConfig
from lidar_graph_slam_tpu.graph.slam import GraphBasedSLAM


def make_backend(**cfg_kw):
    cfg = GraphSlamConfig(**cfg_kw)
    cap = CapacityConfig(max_keyframes=128, max_loop_factors=8, keyframe_points=256,
                         loop_submap_points=1024, voxel_capacity=1024)
    return GraphBasedSLAM(cfg, cap)


def feed_line(back, n, spacing=1.0, accum_per_kf=None):
    """Feed keyframes along a straight line with controllable accumulated distance."""
    accum = 0.0
    for k in range(n):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = k * spacing
        accum += accum_per_kf if accum_per_kf is not None else spacing
        back.add_keyframe({
            "pose": pose,
            "cloud": np.zeros((4, 3), np.float32),
            "cloud_mask": np.ones(4, bool),
            "accum_distance": accum,
        })


def test_no_candidate_without_accum_gap():
    back = make_backend(accumulate_distance_threshold=100.0)
    feed_line(back, 30)  # only 30 m accumulated
    assert back.detect_loop() is None


def test_no_candidate_when_far_away():
    # Long path but latest keyframe is nowhere near any old one.
    back = make_backend(accumulate_distance_threshold=100.0,
                        search_for_candidate_threshold=15.0)
    feed_line(back, 120)  # 120 m straight line: accum gap OK, euclid gate fails
    assert back.detect_loop() is None


def test_candidate_when_revisiting():
    back = make_backend(accumulate_distance_threshold=100.0,
                        search_for_candidate_threshold=15.0)
    # Straight out 110 keyframes, then teleport back near the start with huge accum.
    feed_line(back, 110)
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 2.0  # near keyframe 2
    back.add_keyframe({
        "pose": pose,
        "cloud": np.zeros((4, 3), np.float32),
        "cloud_mask": np.ones(4, bool),
        "accum_distance": 300.0,
    })
    cand = back.detect_loop()
    assert cand is not None
    # Nearest gated keyframe should be the one at x=2.
    assert abs(cand - 2) <= 1


def test_radius_mode_uses_search_radius():
    back = make_backend(accumulate_distance_threshold=100.0,
                        search_for_candidate_threshold=5.0, search_radius=50.0)
    feed_line(back, 110)
    pose = np.eye(4, dtype=np.float32)
    pose[1, 3] = 30.0  # 30 m off the line: outside the 5 m inline gate, inside radius 50
    back.add_keyframe({
        "pose": pose,
        "cloud": np.zeros((4, 3), np.float32),
        "cloud_mask": np.ones(4, bool),
        "accum_distance": 300.0,
    })
    assert back.detect_loop(mode="inline") is None
    assert back.detect_loop(mode="radius") is not None


def test_add_keyframe_chains_on_optimized_pose():
    back = make_backend()
    feed_line(back, 3)
    poses = back.optimized_poses()
    assert poses.shape == (3, 4, 4)
    np.testing.assert_allclose(poses[2, 0, 3], 2.0, atol=1e-6)


def test_accum_mode_ignores_euclidean_gate():
    back = make_backend(accumulate_distance_threshold=100.0,
                        search_for_candidate_threshold=5.0, search_radius=10.0)
    feed_line(back, 110)
    pose = np.eye(4, dtype=np.float32)
    pose[1, 3] = 80.0  # far outside both distance gates
    back.add_keyframe({
        "pose": pose,
        "cloud": np.zeros((4, 3), np.float32),
        "cloud_mask": np.ones(4, bool),
        "accum_distance": 300.0,
    })
    assert back.detect_loop(mode="inline") is None
    assert back.detect_loop(mode="radius") is None
    assert back.detect_loop(mode="accum") is not None
