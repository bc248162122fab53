"""Native host-IO library: build, decode parity, prefetcher ordering, voxel oracle parity."""

import numpy as np
import pytest

from lidar_graph_slam_tpu import native


def make_bins(tmp_path, rng, n_files=5, n_pts=1000):
    paths = []
    for i in range(n_files):
        pts = rng.uniform(-40, 40, size=(n_pts + i * 10, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
    return paths


def test_native_builds():
    assert native.available(), "g++ build of lgs_io.cpp failed"


def test_read_bin_matches_numpy(tmp_path, rng):
    paths = make_bins(tmp_path, rng, n_files=1)
    cap = 2048
    out, n = native.read_bin(paths[0], cap)
    raw = np.fromfile(paths[0], dtype=np.float32).reshape(-1, 4)
    assert n == min(raw.shape[0], cap)
    np.testing.assert_array_equal(out[:n], raw[:n, :3])
    assert (out[n:] == native.PAD_VALUE).all()


def test_read_bin_truncates_to_capacity(tmp_path, rng):
    paths = make_bins(tmp_path, rng, n_files=1, n_pts=500)
    out, n = native.read_bin(paths[0], 100)
    assert n == 100
    assert out.shape == (100, 3)


def test_prefetcher_yields_all_in_order(tmp_path, rng):
    paths = make_bins(tmp_path, rng, n_files=6)
    pf = native.ScanPrefetcher(paths, capacity=2048, depth=2)
    seen = []
    for pts, n in pf:
        raw = np.fromfile(paths[len(seen)], dtype=np.float32).reshape(-1, 4)
        np.testing.assert_array_equal(pts[: min(n, 2048)], raw[: min(n, 2048), :3])
        seen.append(n)
    assert len(seen) == 6
    pf.close()


def test_host_voxel_downsample_matches_numpy(rng):
    pts = rng.uniform(-10, 10, size=(5000, 3)).astype(np.float32)
    leaf = 1.0
    got = native.voxel_downsample_host(pts, leaf)
    # Oracle: python dict grouping with the same min-corner origin.
    origin = pts.min(0)
    coords = np.floor((pts - origin) / leaf).astype(np.int64)
    groups = {}
    for c, p in zip(map(tuple, coords), pts):
        groups.setdefault(c, []).append(p)
    oracle = np.stack([np.mean(np.stack(v), 0) for v in groups.values()])
    assert got.shape[0] == oracle.shape[0]
    a = np.array(sorted(map(tuple, np.round(got, 3))))
    b = np.array(sorted(map(tuple, np.round(oracle, 3))))
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_prefetcher_raises_on_unreadable_file(tmp_path, rng):
    """An unreadable scan must RAISE, never yield n=-1 (slicing out[:-1] would feed
    capacity-1 rows of uninitialized memory to the pipeline as a real scan)."""
    paths = make_bins(tmp_path, rng, n_files=2)
    paths.insert(1, str(tmp_path / "missing.bin"))  # never created
    pf = native.ScanPrefetcher(paths, capacity=2048, depth=2)
    with pytest.raises(OSError):
        for _pts, n in pf:
            assert n >= 0
    pf.close()
