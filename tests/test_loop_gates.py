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


def feed_stamped_line(back, n, spacing=1.0, dt=1.0):
    accum = 0.0
    for k in range(n):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = k * spacing
        accum += spacing
        back.add_keyframe({
            "pose": pose,
            "cloud": np.zeros((4, 3), np.float32),
            "cloud_mask": np.ones(4, bool),
            "accum_distance": accum,
            "stamp": k * dt,
        })


def test_radius_mode_temporal_gate():
    """The dormant kd-tree detector's 30 s gate (`graph_based_slam.cpp:210`): a spatially
    and accum-gated candidate is still rejected when it is too recent in time."""
    # 110 keyframes at 10 s apart: candidate near the start is 1000+ s old -> passes.
    back = make_backend(accumulate_distance_threshold=100.0, search_radius=50.0)
    feed_stamped_line(back, 110, dt=10.0)
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 2.0
    back.add_keyframe({
        "pose": pose, "cloud": np.zeros((4, 3), np.float32),
        "cloud_mask": np.ones(4, bool), "accum_distance": 300.0, "stamp": 1100.0,
    })
    assert back.detect_loop(mode="radius") is not None

    # Same geometry but 0.1 s apart: every candidate is <30 s old -> gated out.
    back2 = make_backend(accumulate_distance_threshold=100.0, search_radius=50.0)
    feed_stamped_line(back2, 110, dt=0.1)
    back2.add_keyframe({
        "pose": pose, "cloud": np.zeros((4, 3), np.float32),
        "cloud_mask": np.ones(4, bool), "accum_distance": 300.0, "stamp": 11.1,
    })
    assert back2.detect_loop(mode="radius") is None

    # Disabling the gate restores the candidate.
    back3 = make_backend(accumulate_distance_threshold=100.0, search_radius=50.0,
                         temporal_gate_sec=0.0)
    feed_stamped_line(back3, 110, dt=0.1)
    back3.add_keyframe({
        "pose": pose, "cloud": np.zeros((4, 3), np.float32),
        "cloud_mask": np.ones(4, bool), "accum_distance": 300.0, "stamp": 11.1,
    })
    assert back3.detect_loop(mode="radius") is not None


def test_keyframe_capacity_refused_and_flagged():
    cfg = GraphSlamConfig()
    cap = CapacityConfig(max_keyframes=4, max_loop_factors=2, keyframe_points=256,
                         loop_submap_points=1024, voxel_capacity=1024)
    back = GraphBasedSLAM(cfg, cap)
    feed_line(back, 6)
    assert back.n_keyframes == 4
    assert back.keyframe_overflow
    # The device graph agrees: no wrap-around write corrupted pose 3.
    assert int(np.asarray(back.graph.num_poses)) == 4


def test_loop_factor_capacity_refused_and_flagged():
    """The (L+1)-th loop factor must be reported, not silently overwrite factor L-1."""
    from lidar_graph_slam_tpu.graph import solver
    import jax.numpy as jnp

    g = solver.init_graph(8, 2, (1e-6,) * 6)
    for k in range(4):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(k)
        g = solver.graph_add_keyframe(g, jnp.asarray(T), jnp.eye(4))
    Z1 = np.eye(4, dtype=np.float32); Z1[1, 3] = 0.5
    g = solver.graph_add_loop(g, jnp.asarray(0), jnp.asarray(2), jnp.asarray(Z1),
                              jnp.ones(6))
    Z2 = np.eye(4, dtype=np.float32); Z2[1, 3] = -0.5
    g = solver.graph_add_loop(g, jnp.asarray(1), jnp.asarray(3), jnp.asarray(Z2),
                              jnp.ones(6))
    assert int(np.asarray(g.num_loops)) == 2
    # Third insert at capacity: dropped, count clamped, factor 1 untouched.
    Z3 = np.eye(4, dtype=np.float32); Z3[2, 3] = 9.0
    g = solver.graph_add_loop(g, jnp.asarray(0), jnp.asarray(3), jnp.asarray(Z3),
                              jnp.full(6, 100.0))
    assert int(np.asarray(g.num_loops)) == 2
    np.testing.assert_allclose(np.asarray(g.loop_meas[1]), Z2, atol=0)
    assert np.asarray(g.loop_info[1]).max() == 1.0

    # Host-side surfacing: a backend at loop capacity refuses and flags.
    cfg = GraphSlamConfig()
    cap = CapacityConfig(max_keyframes=16, max_loop_factors=0, keyframe_points=256,
                         loop_submap_points=1024, voxel_capacity=1024)
    back = GraphBasedSLAM(cfg, cap)
    feed_line(back, 3)
    assert not back.try_close_loop()
    assert back.loop_overflow
    assert back.loop_log and back.loop_log[-1].get("overflow")
