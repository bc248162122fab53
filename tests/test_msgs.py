"""Wire-schema parity tests: core.msgs vs the reference's lidar_graph_slam_msgs
(`msg/KeyFrame.msg:1-5`, `msg/KeyFrameArray.msg:1`, `srv/SaveMap.srv:1-4`)."""

import numpy as np

from lidar_graph_slam_tpu.core.msgs import KeyFrame, KeyFrameArray, SaveMapRequest


def _mk_kf(i: int, n: int, capacity: int = 64) -> KeyFrame:
    rng = np.random.default_rng(i)
    cloud = np.zeros((capacity, 3), np.float32)
    cloud[:n] = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.zeros((capacity,), bool)
    mask[:n] = True
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [i * 1.5, 0.0, 0.0]
    return KeyFrame(
        id=i, pose=pose, cloud=cloud, cloud_mask=mask,
        accum_distance=1.5 * i, frame_index=3 * i, stamp=None if i == 0 else 0.1 * i,
    )


def test_keyframe_mapping_access():
    kf = _mk_kf(2, 10)
    # Back end consumes records via mapping-style access (graph/slam.py add_keyframe).
    assert kf["id"] == 2
    assert np.allclose(kf["pose"], kf.pose)
    assert kf["accum_distance"] == kf.accum_distance
    assert kf.get("missing", 7) == 7
    assert kf.num_points == 10
    assert kf.valid_points().shape == (10, 3)


def test_keyframe_from_dict_round_trip():
    kf = _mk_kf(1, 5)
    d = {k: getattr(kf, k) for k in
         ("id", "pose", "cloud", "cloud_mask", "accum_distance", "frame_index", "stamp")}
    kf2 = KeyFrame.from_dict(d)
    assert kf2.id == kf.id and kf2.stamp == kf.stamp
    assert np.array_equal(kf2.cloud_mask, kf.cloud_mask)


def test_keyframe_array_npz_round_trip(tmp_path):
    arr = KeyFrameArray([_mk_kf(i, n) for i, n in enumerate([5, 64, 0, 17])])
    path = str(tmp_path / "kfs.npz")
    arr.save(path)
    back = KeyFrameArray.load(path)
    assert len(back) == 4
    for a, b in zip(arr, back):
        assert a.id == b.id and a.frame_index == b.frame_index
        assert abs(a.accum_distance - b.accum_distance) < 1e-9
        assert (a.stamp is None) == (b.stamp is None)
        assert np.allclose(a.pose, b.pose)
        assert np.allclose(a.valid_points(), b.valid_points())
    assert np.allclose(back.poses(), arr.poses())
    # Padding capacity is a multiple of 256 and fits the largest cloud.
    assert back[0].cloud.shape[0] % 256 == 0 and back[1].num_points == 64


def test_keyframe_array_load_explicit_capacity(tmp_path):
    arr = KeyFrameArray([_mk_kf(0, 8)])
    path = str(tmp_path / "kfs.npz")
    arr.save(path)
    back = KeyFrameArray.load(path, capacity=32)
    assert back[0].cloud.shape == (32, 3) and back[0].num_points == 8


def test_front_end_emits_keyframe_records():
    # The scan matcher's keyframe log is typed (not ad-hoc dicts): feed two displaced scans.
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core.config import ScanMatcherConfig, NdtConfig
    from lidar_graph_slam_tpu.core.pointcloud import PointCloud
    from lidar_graph_slam_tpu.io.synthetic import make_world, simulate_scan
    from lidar_graph_slam_tpu.odometry.scan_matcher import ScanMatcher

    rng = np.random.default_rng(0)
    world = make_world(rng, extent=30.0, density=2.0)
    cfg = ScanMatcherConfig(displacement=0.5, max_scan_accumulate_num=4,
                            ndt=NdtConfig(max_iterations=8))
    sm = ScanMatcher(cfg, scan_capacity=2048, map_voxel_capacity=8192)
    T = np.eye(4, dtype=np.float32)
    for i in range(3):
        T[0, 3] = 0.8 * i
        scan = simulate_scan(world, T, rng, max_points=2048, noise=0.01)
        sm.process(PointCloud.from_array(scan, capacity=2048), stamp=0.1 * i)
    assert len(sm.keyframe_log) >= 1
    kf = sm.keyframe_log[0]
    assert isinstance(kf, KeyFrame)
    assert kf.id == 0 and kf["accum_distance"] == 0.0
    assert kf.stamp == 0.0


def test_save_map_request_schema():
    req = SaveMapRequest(resolution=0.5, path="/tmp/map.pcd")
    assert req.resolution == 0.5 and req.path.endswith(".pcd")
