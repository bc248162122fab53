"""Config system (YAML + CLI overrides) and file I/O round trips."""

import numpy as np
import pytest

from lidar_graph_slam_tpu.core.config import (
    PipelineConfig,
    apply_cli_overrides,
    load_config,
)
from lidar_graph_slam_tpu.io import pcd


def test_defaults_match_reference():
    # The default config IS the reference's implicit baseline (BASELINE.md).
    cfg = PipelineConfig()
    assert cfg.scan_matcher.displacement == 1.0
    assert cfg.scan_matcher.max_scan_accumulate_num == 20
    assert cfg.scan_matcher.ndt.resolution == 2.0
    assert cfg.prefilter.leaf_size == 0.1
    assert cfg.prefilter.mean_k == 30
    assert cfg.prefilter.stddev == 1.2
    assert cfg.graph_slam.score_threshold == 0.3
    assert cfg.graph_slam.accumulate_distance_threshold == 100.0
    assert cfg.graph_slam.search_for_candidate_threshold == 15.0
    assert cfg.graph_slam.odom_noise_var == (1e-6, 1e-6, 1e-6, 1e-8, 1e-8, 1e-6)
    assert cfg.graph_slam.icp.max_correspondence_distance == 30.0
    assert cfg.graph_slam.icp.max_iterations == 100


def test_yaml_load(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "scan_matcher:\n  registration_method: GICP\n  displacement: 2.0\n"
        "prefilter:\n  leaf_size: 0.25\n"
        "graph_slam:\n  score_threshold: 0.5\n"
    )
    cfg = load_config(str(p))
    assert cfg.scan_matcher.registration_method == "GICP"
    assert cfg.scan_matcher.displacement == 2.0
    assert cfg.prefilter.leaf_size == 0.25
    assert cfg.graph_slam.score_threshold == 0.5
    # untouched fields keep defaults
    assert cfg.scan_matcher.ndt.resolution == 2.0


def test_cli_overrides():
    cfg = apply_cli_overrides(
        PipelineConfig(),
        ["scan_matcher.ndt.resolution=1.5", "enable_loop_closure=False",
         "capacity.max_keyframes=128", "scan_matcher.registration_method=ICP"],
    )
    assert cfg.scan_matcher.ndt.resolution == 1.5
    assert cfg.enable_loop_closure is False
    assert cfg.capacity.max_keyframes == 128
    assert cfg.scan_matcher.registration_method == "ICP"


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_cli_overrides(PipelineConfig(), ["scan_matcher.nonexistent=1"])


def test_pcd_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    pcd.write_pcd(p, pts, binary=True)
    back = pcd.read_pcd(p)
    np.testing.assert_array_equal(pts, back)


def test_pcd_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    pcd.write_pcd(p, pts, binary=False)
    back = pcd.read_pcd(p)
    np.testing.assert_allclose(pts, back, atol=1e-5)


def test_trajectory_exports(tmp_path, rng):
    from lidar_graph_slam_tpu.core import se3
    import jax.numpy as jnp

    n = 10
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    tum = str(tmp_path / "t.txt")
    kitti = str(tmp_path / "k.txt")
    pcd.write_tum_trajectory(tum, poses)
    pcd.write_kitti_trajectory(kitti, poses)
    tum_back = np.loadtxt(tum)
    assert tum_back.shape == (n, 8)
    np.testing.assert_allclose(tum_back[:, 1:4], poses[:, :3, 3], atol=1e-5)
    kitti_back = np.loadtxt(kitti).reshape(n, 3, 4)
    np.testing.assert_allclose(kitti_back, poses[:, :3, :4], atol=1e-5)


def test_kitti_loader(tmp_path, rng):
    # Synthesize a miniature KITTI layout and load it back.
    import os

    seq_dir = tmp_path / "sequences" / "00"
    velo = seq_dir / "velodyne"
    os.makedirs(velo)
    os.makedirs(tmp_path / "poses")
    for i in range(3):
        rng.normal(size=(200, 4)).astype(np.float32).tofile(str(velo / f"{i:06d}.bin"))
    gt = np.tile(np.eye(4), (3, 1, 1))
    gt[:, 0, 3] = [0, 1, 2]
    np.savetxt(str(tmp_path / "poses" / "00.txt"), gt[:, :3, :4].reshape(3, 12))
    (seq_dir / "calib.txt").write_text(
        "Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )

    from lidar_graph_slam_tpu.io.kitti import KittiSequence

    seq = KittiSequence(str(tmp_path), "00", max_points=256)
    assert len(seq) == 3
    frames = list(seq)
    assert frames[0][0].shape[1] == 3
    np.testing.assert_allclose(frames[2][1][0, 3], 2.0, atol=1e-6)
