"""Offline visualization + compile-cache helpers — smoke coverage for the two
utility modules nothing else exercises (`utils/viz.py` is the rviz stand-in,
`rviz/rviz.config:80-281` in the reference; `utils/jit_cache.py` is accelerator-only
by design)."""

import os

import numpy as np

from lidar_graph_slam_tpu.utils import viz
from lidar_graph_slam_tpu.utils.jit_cache import enable_compilation_cache


def _poses_on_line(n):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n, dtype=np.float32)
    return poses


def test_render_run_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "run.png")
    viz.render_run(
        path,
        map_points=rng.normal(size=(500, 3)).astype(np.float32),
        odometry_poses=_poses_on_line(20),
        keyframe_poses=_poses_on_line(5),
        loop_pairs=[(0, 4)],
        rejected_pairs=[(1, 3)],
        gt_poses=_poses_on_line(20),
    )
    assert os.path.getsize(path) > 1000  # a real PNG, not an empty file


def test_render_run_handles_empty_inputs(tmp_path):
    path = str(tmp_path / "empty.png")
    viz.render_run(path, map_points=np.zeros((0, 3), np.float32),
                   odometry_poses=np.zeros((0, 4, 4), np.float32))
    assert os.path.exists(path)


def test_compilation_cache_refuses_cpu():
    # Tests always run on the CPU backend (conftest); the cache must stay off there —
    # cached CPU executables from a different compile host can be silently wrong
    # (jit_cache.py module docstring).
    assert enable_compilation_cache() is False
