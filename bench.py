"""Benchmark: scan-to-submap registration throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the front end's hot loop (SURVEY.md §3.2): NDT alignment of a prefiltered
scan against a 20-keyframe submap voxel map, steady state (compile excluded), constant-
velocity initial guess. `vs_baseline` normalizes against 10 frames/s — the sensor rate the
reference's NDT_OMP front end must sustain for real-time operation (the reference publishes
no numbers of its own; BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    from lidar_graph_slam_tpu.core.config import NdtConfig
    from lidar_graph_slam_tpu.core.pointcloud import PointCloud
    from lidar_graph_slam_tpu.io.synthetic import make_world, make_loop_trajectory, simulate_scan
    from lidar_graph_slam_tpu.registration.ndt import make_ndt_matcher

    rng = np.random.default_rng(0)
    world = make_world(rng, extent=60.0, density=4.0)
    traj = make_loop_trajectory(40, radius=35.0, laps=0.3)

    scan_capacity = 16384
    cfg = NdtConfig()
    build_target, align = make_ndt_matcher(cfg, map_capacity=65536)

    # Submap: 20 simulated keyframes along the trajectory, world frame.
    submap_pts = []
    for i in range(0, 20):
        s = simulate_scan(world, traj[i], rng, max_points=8192, noise=0.02)
        submap_pts.append(s @ traj[i][:3, :3].T + traj[i][:3, 3])
    submap = np.concatenate(submap_pts).astype(np.float32)
    sub_cloud = PointCloud.from_array(submap, capacity=262144)
    target = build_target(sub_cloud.points, sub_cloud.mask)

    # Scans to align: frames 20..39 (overlapping the submap region).
    scans, guesses = [], []
    for i in range(20, 40):
        s = simulate_scan(world, traj[i], rng, max_points=scan_capacity, noise=0.02)
        scans.append(PointCloud.from_array(s, capacity=scan_capacity))
        guesses.append(jnp.asarray(traj[max(i - 1, 0)]))  # constant-pose-ish guess

    # Warmup / compile.
    r = align(target, scans[0].points, scans[0].mask, guesses[0])
    r.transform.block_until_ready()

    t0 = time.perf_counter()
    n = 0
    for cloud, guess in zip(scans, guesses):
        r = align(target, cloud.points, cloud.mask, guess)
        n += 1
    r.transform.block_until_ready()
    dt = time.perf_counter() - t0

    fps = n / dt
    print(json.dumps({
        "metric": "scan_match_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
