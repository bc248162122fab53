"""Benchmark: the BASELINE.json metric surface on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric (unchanged across rounds, drives vs_baseline): scan-to-submap NDT
throughput — the front end's hot loop (SURVEY.md §3.2), steady state, compile excluded.
`vs_baseline` normalizes against 10 frames/s, the sensor rate the reference's NDT_OMP
front end must sustain for real-time operation (the reference publishes no numbers of its
own — BASELINE.md; 10 Hz is the Velodyne default, an assumption not a measurement).

`extra` carries the rest of the BASELINE.json "metric" line (VERDICT r02 item 3):
  * pose_graph_solve_ms — full LM solve (`graph/solver.py:optimize`, 15 iterations) at
    K∈{1024,4096} keyframes with L∈{8,64} loop factors; cold = poses initialized from
    drifted odometry chaining, warm = re-solve from the optimum (the iSAM2-analog
    incremental case, `graph_based_slam.cpp:373-374`).
  * e2e_pipeline — full SlamPipeline (fused driver, prefilter -> NDT odometry ->
    keyframing -> back end + loop closure) on KITTI-shaped raw scans (~100k pts/frame).
  * ndt_accumulate roofline — the hot kernel's achieved HBM bandwidth vs the chip's
    measured streaming peak (self-calibrated: no hardcoded chip specs). The kernel is
    gather/bandwidth-bound (~220 FLOP per 64-byte correspondence row), so bandwidth
    fraction IS the speed-of-light measure.
"""

import json
import time

import numpy as np


def _timeit(fn, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def bench_scan_match():
    """Headline: NDT scan-to-submap alignment frames/s (steady state)."""
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core.config import NdtConfig
    from lidar_graph_slam_tpu.core.pointcloud import PointCloud
    from lidar_graph_slam_tpu.io.synthetic import make_loop_trajectory, make_world, simulate_scan
    from lidar_graph_slam_tpu.registration.ndt import make_ndt_matcher

    rng = np.random.default_rng(0)
    world = make_world(rng, extent=60.0, density=4.0)
    traj = make_loop_trajectory(40, radius=35.0, laps=0.3)

    scan_capacity = 16384
    build_target, align = make_ndt_matcher(NdtConfig(), map_capacity=65536)

    submap_pts = []
    for i in range(0, 20):
        s = simulate_scan(world, traj[i], rng, max_points=8192, noise=0.02)
        submap_pts.append(s @ traj[i][:3, :3].T + traj[i][:3, 3])
    submap = np.concatenate(submap_pts).astype(np.float32)
    sub_cloud = PointCloud.from_array(submap, capacity=262144)
    target = build_target(sub_cloud.points, sub_cloud.mask)

    scans, guesses = [], []
    for i in range(20, 40):
        s = simulate_scan(world, traj[i], rng, max_points=scan_capacity, noise=0.02)
        scans.append(PointCloud.from_array(s, capacity=scan_capacity))
        guesses.append(jnp.asarray(traj[max(i - 1, 0)]))  # constant-pose-ish guess

    r = align(target, scans[0].points, scans[0].mask, guesses[0])  # compile
    r.transform.block_until_ready()

    t0 = time.perf_counter()
    n = 0
    for cloud, guess in zip(scans, guesses):
        r = align(target, cloud.points, cloud.mask, guess)
        n += 1
    r.transform.block_until_ready()
    return n / (time.perf_counter() - t0)


def bench_pose_graph():
    """Solve-ms for the back end's LM at production graph sizes, cold and warm."""
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core import se3
    from lidar_graph_slam_tpu.graph import solver

    out = {}
    rng = np.random.default_rng(0)
    for K in (1024, 4096):
        for L in (8, 64):
            g = solver.init_graph(K, L, (1e-6,) * 3 + (1e-8, 1e-8, 1e-6))
            # Ground-truth circle; odometry measurements carry noise so the cold start
            # (chained odometry) is genuinely drifted. Poses/odoms composed host-side,
            # inserted with the batched program (one dispatch per 512 keyframes).
            step = 2 * np.pi / K
            xi = np.tile(np.array([0, 0, step, 1.0, 0, 0], np.float32), (K, 1))
            xi[:, :3] += rng.normal(scale=1e-4, size=(K, 3))
            xi[:, 3:] += rng.normal(scale=1e-3, size=(K, 3))
            meas = np.asarray(jax.vmap(se3.se3_exp)(jnp.asarray(xi)))
            poses = np.empty((K, 4, 4), np.float32)
            odoms = np.empty((K, 4, 4), np.float32)
            T = np.eye(4, dtype=np.float32)
            poses[0], odoms[0] = T, np.eye(4, dtype=np.float32)
            for k in range(1, K):
                T = T @ meas[k]
                poses[k], odoms[k] = T, meas[k]
            for lo in range(0, K, 512):
                g = solver.graph_add_keyframes_batch(
                    g, jnp.asarray(poses[lo:lo + 512]), jnp.asarray(odoms[lo:lo + 512]),
                    jnp.asarray(min(512, K - lo), jnp.int32),
                )
            for l in range(L):
                i = (l * K // L) % K
                j = (i + K // 2) % K
                Zl = np.asarray(
                    se3.inverse(jnp.asarray(g.poses[i])) @ jnp.asarray(g.poses[j])
                )
                g = solver.graph_add_loop(
                    g, jnp.asarray(i), jnp.asarray(j), jnp.asarray(Zl),
                    jnp.full((6,), 1e2, jnp.float32),
                )
            cold_poses = g.poses

            opt = lambda gg: solver.optimize(gg, max_iterations=15).poses  # noqa: E731
            opt(g)  # compile
            cold_ms = _timeit(lambda: opt(g.replace(poses=cold_poses)), n=5) * 1e3
            # Warm = the iSAM2-analog incremental case: re-solve from a CONVERGED state
            # (drive there with a generous budget first; plain 15 iterations leave the
            # big graphs still descending, which made warm==cold in earlier rounds).
            g_warm = g
            for _ in range(4):
                g_warm = solver.optimize(g_warm, max_iterations=50)
            warm_ms = _timeit(lambda: opt(g_warm), n=5) * 1e3
            out[f"K{K}_L{L}"] = {"cold_ms": round(cold_ms, 2), "warm_ms": round(warm_ms, 2)}
    return out


def bench_e2e(n_frames=180):
    """Full pipeline frames/s on KITTI-shaped raw scans with loop closure.

    Course realism matters: 180 frames over 1.05 laps of a 35 m circle is ~1.3 m per
    frame — automotive KITTI motion at 10 Hz (and ≥ the 1.0 m keyframe displacement, so
    nearly every frame rebuilds the submap, the reference's worst case
    `lidar_scan_matcher.cpp:199-212`). The round-3 original used 4 m/frame, which no
    constant-pose-guess matcher (ours or the reference's) can track."""
    from lidar_graph_slam_tpu.core.config import PipelineConfig
    from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence
    from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline

    seq = SyntheticSequence(
        n_frames=n_frames, seed=1, extent=60.0, radius=35.0, max_points=131072,
        noise=0.02, laps=1.05,
        # HDL-64-shaped beam grid (2048 azimuth x 64 elevation ≈ 131k beams).
        n_azimuth=2048, n_elevation=64,
    )
    # Dense world so raw scans approach the Velodyne HDL-64 ~131k-point shape.
    rng = np.random.default_rng(1)
    from lidar_graph_slam_tpu.io.synthetic import make_world

    seq.world = make_world(rng, extent=60.0, density=30.0)
    pipe = SlamPipeline(PipelineConfig())
    scans = [scan for scan, _ in seq]
    mean_pts = float(np.mean([s.shape[0] for s in scans]))

    pipe.process_scan(scans[0])  # compile the non-keyframe path
    frame_walls = []
    t0 = time.perf_counter()
    for s in scans[1:]:
        a = time.perf_counter()
        pipe.process_scan(s)
        frame_walls.append(time.perf_counter() - a)
    pipe.flush()
    dt = time.perf_counter() - t0
    res = pipe.result()
    # steady_fps is median-based: first-time compiles (keyframe path, loop verifier,
    # graph solve — 30-90 s each through the remote compile service) land inside the
    # run and would otherwise dominate the mean; they are one-time costs amortized by
    # the persistent compilation cache, not per-frame throughput.
    med = float(np.median(frame_walls))
    return {
        "steady_fps": round(1.0 / max(med, 1e-9), 2),
        "full_run_fps": round((n_frames - 1) / dt, 2),
        "mean_raw_points": int(mean_pts),
        "keyframes": int(res.keyframe_poses.shape[0]),
        "loops_accepted": int(res.num_loop_closures),
    }


def bench_roofline():
    """ndt_accumulate achieved HBM bandwidth vs measured streaming peak."""
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.ops import pallas_kernels

    # Self-calibrated streaming peak: big saxpy (read + write 256 MiB each way).
    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    saxpy = jax.jit(lambda x: x * 1.0001 + 1.0)
    t_peak = _timeit(lambda: saxpy(x), n=10)
    peak_gbs = (2 * x.size * 4) / t_peak / 1e9

    n = 16384 * 7  # one front-end iteration's correspondence count
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ic = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    ic = ic + jnp.asarray(rng.normal(scale=0.01, size=(n, 3, 3)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    m = jnp.asarray(rng.random(n) > 0.1)

    on_tpu = jax.devices()[0].platform != "cpu"
    kern = pallas_kernels.ndt_accumulate if on_tpu else pallas_kernels.ndt_accumulate_xla
    t_k = _timeit(lambda: kern(e, ic, p, m, 1.0, 1.0), n=20)
    # Bytes per correspondence row: e 12 + icov 36 + p 12 + mask 1; outputs are O(1).
    bytes_moved = n * (12 + 36 + 12 + 1)
    flops = n * 220  # analytic: weight + e^T S^-1 e + J^T w J accumulation per row
    achieved_gbs = bytes_moved / t_k / 1e9
    return {
        "kernel": "pallas" if on_tpu else "xla",
        "ms": round(t_k * 1e3, 4),
        "achieved_gbytes_per_s": round(achieved_gbs, 1),
        "gflops_per_s": round(flops / t_k / 1e9, 1),
        "peak_stream_gbytes_per_s": round(peak_gbs, 1),
        "roofline_frac": round(achieved_gbs / peak_gbs, 3),
    }


def main():
    from lidar_graph_slam_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    fps = bench_scan_match()
    extra = {
        "pose_graph_solve_ms": bench_pose_graph(),
        "e2e_pipeline": bench_e2e(),
        "ndt_accumulate_roofline": bench_roofline(),
    }
    print(json.dumps({
        "metric": "scan_match_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
