"""Benchmark: the BASELINE.json metric surface on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric (unchanged across rounds, drives vs_baseline): scan-to-submap NDT
throughput — the front end's hot loop (SURVEY.md §3.2), steady state, compile excluded.
`vs_baseline` normalizes against 10 frames/s, the sensor rate the reference's NDT_OMP
front end must sustain for real-time operation (the reference publishes no numbers of
its own — BASELINE.md; 10 Hz is the Velodyne default, an assumption not a measurement).

TIMING METHODOLOGY (r04 correction): on this environment's tunneled TPU,
`block_until_ready` returns WITHOUT waiting for device completion, so every
repeated-dispatch timing in rounds 1-3 (scan_match_fps, pose_graph_solve_ms, roofline)
measured host dispatch cost, not device compute — including the r02->r03 "regression"
114.6 -> 46.9 fps, which was a dispatch-overhead artifact (the r03 pyramid issues two
aligns per frame). Every timed region now ends with a data FETCH of a value dependent
on the measured computation, and the fetch round-trip (measured separately) is
subtracted. Numbers in this file are therefore NOT comparable to BENCH_r01-r03.

`extra` carries the rest of the BASELINE.json "metric" line:
  * scan_match_ab — A/B decomposition of the headline (pyramid / polish / occlusion).
  * pose_graph_solve_ms — the engine's public solve (`solver.solve_incremental`:
    host-f64 GN + device-f32 LM escalation) at K in {1024, 4096}, L in {8, 64};
    cold = drifted odometry chaining with loop factors measured from ground truth
    (r03's construction derived loops from the drifted poses themselves, making the
    drifted chain the optimum — a degenerate "cold" start); warm = re-solve from the
    converged state (the iSAM2-analog per-keyframe case, `graph_based_slam.cpp:373-374`).
    `final_cost_f64` vs `final_cost_f32lm` records the accuracy the f64 tail buys.
  * e2e_pipeline — full SlamPipeline on the synthetic loop course, TWO laps (several
    loop closures), with ATE/RPE against ground truth, loop-closure ON and OFF
    (BASELINE.md: "KITTI-00 ATE within the reference bound" — no KITTI data exists in
    this environment, so the synthetic course is the parity instrument; a KITTI branch
    runs automatically when $KITTI_ROOT points at real data).
  * e2e_dense — steady fps on an urban-canyon course at HDL-64-class point load.
    (The open course's ~29k pts/frame is VLP-32-class: beam-occupancy physics caps
    open scenes near ~60k occupied beams no matter the world density — up-beams see
    sky. The canyon course fills the elevation fan instead of inflating a claim.)
  * frame_budget — device-time decomposition of one dense-course odometry frame.
  * ndt_accumulate — the GN inner-loop accumulation standalone + the r05 record of
    the Pallas-kernel deletion (XLA won the end-to-end A/B).
  * device_f64 — subprocess probe: can the TPU compile an f64 linear solve at all?
"""

import json
import os
import time

import numpy as np


# --- honest timing on the tunneled TPU ---------------------------------------------------


def _fetch(x):
    """Force completion by fetching bytes of a (small) dependent array."""
    import jax

    return jax.device_get(jax.tree.leaves(x)[0])


def _measure_fetch_overhead(n=8):
    """Round-trip cost of one tiny dependent fetch (subtracted from timed regions).
    MEDIAN of n single-fetch samples — the tunnel round trip jitters 25x between
    minutes, and over-estimating the overhead would inflate every derived rate."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda s: s + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    x = f(x)
    _fetch(x)
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = f(x)          # fresh value each time — cached fetches would read 0 ms
        _fetch(x)
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def _timeit(fn, n=10, warmup=2, fetch_overhead=None):
    """Mean per-call seconds: n async dispatches + ONE final fetch (the device queue is
    FIFO, so the last result completing means all completed), minus the fetch RTT."""
    if fetch_overhead is None:
        fetch_overhead = _measure_fetch_overhead()
    r = None
    for _ in range(warmup):
        r = fn()
    _fetch(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _fetch(r)
    return max(time.perf_counter() - t0 - fetch_overhead, 1e-9) / n


# --- headline: scan-to-submap NDT ---------------------------------------------------------


def _scan_match_fixture(occlusion=True):
    from lidar_graph_slam_tpu.core.pointcloud import PointCloud
    from lidar_graph_slam_tpu.io.synthetic import (
        make_loop_trajectory, make_world, simulate_scan)

    rng = np.random.default_rng(0)
    world = make_world(rng, extent=60.0, density=4.0)
    traj = make_loop_trajectory(40, radius=35.0, laps=0.3)
    scan_capacity = 16384
    submap_pts = []
    for i in range(0, 20):
        s = simulate_scan(world, traj[i], rng, max_points=8192, noise=0.02,
                          occlusion=occlusion)
        submap_pts.append(s @ traj[i][:3, :3].T + traj[i][:3, 3])
    submap = np.concatenate(submap_pts).astype(np.float32)
    sub_cloud = PointCloud.from_array(submap, capacity=262144)
    scans, guesses = [], []
    for i in range(20, 40):
        s = simulate_scan(world, traj[i], rng, max_points=scan_capacity, noise=0.02,
                          occlusion=occlusion)
        scans.append(PointCloud.from_array(s, capacity=scan_capacity))
        guesses.append(np.asarray(traj[max(i - 1, 0)], np.float32))
    return sub_cloud, scans, guesses


def bench_scan_match(cfg=None, occlusion=True, fetch_overhead=None):
    """NDT scan-to-submap alignment (frames/s, mean align iterations), fetch-synced
    steady state."""
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core.config import NdtConfig
    from lidar_graph_slam_tpu.registration.ndt import make_ndt_matcher

    cfg = cfg or NdtConfig()
    sub_cloud, scans, guesses = _scan_match_fixture(occlusion=occlusion)
    build_target, align = make_ndt_matcher(cfg, map_capacity=65536)
    target = build_target(sub_cloud.points, sub_cloud.mask)
    guesses = [jnp.asarray(g) for g in guesses]

    r = align(target, scans[0].points, scans[0].mask, guesses[0])  # compile
    _fetch(r.transform)
    if fetch_overhead is None:
        fetch_overhead = _measure_fetch_overhead()
    iters = []
    t0 = time.perf_counter()
    for cloud, guess in zip(scans, guesses):
        r = align(target, cloud.points, cloud.mask, guess)
        iters.append(r.iterations)
    _fetch(r.transform)
    dt = time.perf_counter() - t0 - fetch_overhead
    fps = len(scans) / max(dt, 1e-9)
    # Mean align iterations (fetched AFTER the timed loop): the data-dependent
    # while_loop count is what the pyramid A/B actually trades — the coarse level
    # drops fine iterations ~14 -> ~2 on this course (r05 diagnostic).
    mean_iters = float(np.mean([int(x) for x in jax.device_get(iters)])) if iters else 0.0
    return fps, mean_iters


def bench_scan_match_ab(fetch_overhead=None):
    """A/B decomposition of the headline config (VERDICT r03 item 5)."""
    import dataclasses

    from lidar_graph_slam_tpu.core.config import NdtConfig

    base = NdtConfig()
    out = {}
    fps, it = bench_scan_match(
        dataclasses.replace(base, coarse_resolution=0.0),
        fetch_overhead=fetch_overhead)
    out["no_pyramid_fps"] = round(fps, 1)
    out["no_pyramid_mean_iters"] = round(it, 1)
    fps, _ = bench_scan_match(base, occlusion=False, fetch_overhead=fetch_overhead)
    out["no_occlusion_fps"] = round(fps, 1)
    out["gicp_fps"] = round(bench_scan_match_gicp(fetch_overhead=fetch_overhead), 1)
    return out


def bench_scan_match_gicp(fetch_overhead=None):
    """GICP scan-to-submap fps on the headline fixture — the reference's FAST_GICP
    alternative front end (`lidar_scan_matcher.cpp:37-54`; BASELINE configs[1] names
    "GICP scan-to-map refinement"). Per-frame source-covariance estimation is part of
    the measured loop, as in the production fused front end. GICP's hot loop is a
    per-iteration single-NN search over the full submap grid (vs NDT's 7-voxel
    Gaussian gather) — structurally ~10x the memory traffic per iteration, which is
    why NDT is the default and the fast path on this hardware."""
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core.config import GicpConfig
    from lidar_graph_slam_tpu.registration import gicp

    cfg = GicpConfig()
    sub_cloud, scans, guesses = _scan_match_fixture()
    build_target, align = gicp.make_gicp_matcher(cfg)
    target = build_target(sub_cloud.points, sub_cloud.mask)
    guesses = [jnp.asarray(g) for g in guesses]

    def run(cloud, guess):
        covs, _ = gicp.estimate_covariances(
            cloud.points, cloud.mask, cfg.max_correspondence_distance,
            k=cfg.correspondence_randomness)
        return align(target, cloud.points, cloud.mask, guess, covs)

    r = run(scans[0], guesses[0])  # compile
    _fetch(r.transform)
    if fetch_overhead is None:
        fetch_overhead = _measure_fetch_overhead()
    t0 = time.perf_counter()
    for cloud, guess in zip(scans, guesses):
        r = run(cloud, guess)
    _fetch(r.transform)
    dt = time.perf_counter() - t0 - fetch_overhead
    return len(scans) / max(dt, 1e-9)


def bench_frame_budget(fetch_overhead=None):
    """Device-time decomposition of one DENSE-course odometry frame (VERDICT r04
    item 3): where do the milliseconds go? Each stage is timed with a dispatch chain
    ending in one dependent fetch (the only honest timing on this backend). The
    keyframe-frame total is fused_step + insert_and_rebuild — at automotive motion
    nearly every frame keyframes, so that sum bounds the steady frame time."""
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core.config import (
        CapacityConfig, PrefilterConfig, ScanMatcherConfig)
    from lidar_graph_slam_tpu.core.pointcloud import PAD_VALUE
    from lidar_graph_slam_tpu.filters.prefilter import make_prefilter
    from lidar_graph_slam_tpu.io.synthetic import (
        SyntheticSequence, make_world, simulate_scan)
    from lidar_graph_slam_tpu.odometry.fused import make_fused_frontend

    fo = fetch_overhead if fetch_overhead is not None else _measure_fetch_overhead()
    rng = np.random.default_rng(2)
    world = make_world(rng, extent=60.0, density=60.0, wall_height=12.0,
                       box_height=(6.0, 25.0), n_boxes=60)
    seq = SyntheticSequence(n_frames=6, seed=2, radius=35.0, laps=0.05,
                            max_points=131072, n_azimuth=2048, n_elevation=64)
    scan = simulate_scan(world, seq.poses[5], rng, max_points=131072,
                         n_azimuth=2048, n_elevation=64)
    cap = CapacityConfig()
    pcfg = PrefilterConfig()
    pf = make_prefilter(pcfg, capacity_out=cap.filtered_points,
                        voxel_capacity=min(cap.raw_points, 2 * cap.filtered_points))
    raw = np.full((131072, 3), PAD_VALUE, np.float32)
    raw[: scan.shape[0]] = scan
    raw = jnp.asarray(raw)
    raw_mask = raw[:, 0] < 0.5 * PAD_VALUE
    out = {"raw_points": int(scan.shape[0])}

    f = pf(raw, raw_mask)
    out["prefilter_ms"] = round(1e3 * _timeit(
        lambda: pf(raw, raw_mask), n=20, fetch_overhead=fo), 2)

    init_state, step, aux = make_fused_frontend(ScanMatcherConfig(), pcfg, cap)
    st = init_state()
    ring = aux["init_ring"]()
    guess = jnp.asarray(seq.poses[5], jnp.float32)
    iar = aux["insert_and_rebuild"]
    for i in range(20):  # fill the ring (production occupancy)
        ring, tgt = iar(ring, jnp.asarray(i % 20, jnp.int32), f.points, f.mask, guess)
    _fetch(jax.tree.leaves(tgt)[0])

    slot = jnp.asarray(0, jnp.int32)

    def one_iar():
        nonlocal ring
        ring, t = iar(ring, slot, f.points, f.mask, guess)
        return jax.tree.leaves(t)[0]

    out["insert_and_rebuild_ms"] = round(1e3 * _timeit(one_iar, n=15, fetch_overhead=fo), 2)

    eye3 = jnp.eye(3, dtype=jnp.float32)
    eye4 = jnp.eye(4, dtype=jnp.float32)
    false = jnp.asarray(False)
    # Seed the state at the scan's true pose — STEADY-STATE conditions (pose track on,
    # constant-pose guess lands ~0 m from the optimum, align converges in ~1-2
    # iterations like a real mid-run frame). An unseeded state leaves the pose at
    # identity, 35 m from the submap: the align burns its full iteration budget
    # without converging and the "budget" reads the never-converge worst case
    # (measured 748 ms vs 36 ms seeded — the r05 diagnostic that motivated this).
    st = st.replace(pose=guess + 0.0, last_kf_pose=guess + 0.0,
                    n_keyframes=jnp.int32(1))
    st, o = step(st, raw, tgt, eye3, false, eye4, false)

    def one_step():
        nonlocal st
        st, o = step(st, raw, tgt, eye3, false, eye4, false)
        return o.pose

    out["fused_step_ms"] = round(1e3 * _timeit(one_step, n=20, fetch_overhead=fo), 2)
    out["keyframe_frame_total_ms"] = round(
        out["fused_step_ms"] + out["insert_and_rebuild_ms"], 2)

    # Align decomposition (the step minus prefilter): full pyramid vs fine-only.
    from lidar_graph_slam_tpu.core.config import NdtConfig
    from lidar_graph_slam_tpu.registration.ndt import make_ndt_matcher, ndt_align

    ncfg = NdtConfig()
    _bt, align = make_ndt_matcher(ncfg, map_capacity=cap.voxel_capacity)
    out["align_full_ms"] = round(1e3 * _timeit(
        lambda: align(tgt, f.points, f.mask, guess).transform,
        n=20, fetch_overhead=fo), 2)
    fine = tgt[1] if isinstance(tgt, tuple) else tgt
    out["align_fine_only_ms"] = round(1e3 * _timeit(
        lambda: ndt_align(fine, f.points, f.mask, guess,
                          step_size=ncfg.step_size,
                          transform_epsilon=ncfg.transform_epsilon,
                          outlier_ratio=ncfg.outlier_ratio,
                          max_iterations=ncfg.max_iterations).transform,
        n=20, fetch_overhead=fo), 2)
    return out


# --- pose-graph solve ---------------------------------------------------------------------


def _build_bench_graph(K, L, rng):
    """Drifted odometry chain on a circle with loop factors measured from GROUND TRUTH
    (so the optimum genuinely differs from the initialization)."""
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.core import se3
    from lidar_graph_slam_tpu.graph import refine64, solver

    g = solver.init_graph(K, L, (1e-6,) * 3 + (1e-8, 1e-8, 1e-6))
    step = 2 * np.pi / K
    xi_gt = np.tile(np.array([0, 0, step, 1.0, 0, 0], np.float64), (K, 1))
    xi = xi_gt.copy()
    xi[:, :3] += rng.normal(scale=1e-4, size=(K, 3))
    xi[:, 3:] += rng.normal(scale=1e-3, size=(K, 3))
    meas = refine64.se3_exp(xi)
    meas_gt = refine64.se3_exp(xi_gt)
    poses = np.empty((K, 4, 4), np.float64)
    gt = np.empty((K, 4, 4), np.float64)
    odoms = np.empty((K, 4, 4), np.float64)
    T, Tg = np.eye(4), np.eye(4)
    poses[0], odoms[0], gt[0] = T, np.eye(4), Tg
    for k in range(1, K):
        T = T @ meas[k]
        Tg = Tg @ meas_gt[k]
        poses[k], odoms[k], gt[k] = T, meas[k], Tg
    for lo in range(0, K, 512):
        g = solver.graph_add_keyframes_batch(
            g, jnp.asarray(poses[lo:lo + 512], jnp.float32),
            jnp.asarray(odoms[lo:lo + 512], jnp.float32),
            jnp.asarray(min(512, K - lo), jnp.int32))
    for l in range(L):
        i = (l * K // L) % K
        j = (i + K // 2) % K
        Zl = np.linalg.inv(gt[i]) @ gt[j]
        g = solver.graph_add_loop(
            g, jnp.asarray(i), jnp.asarray(j), jnp.asarray(Zl, jnp.float32),
            jnp.full((6,), 1e2, jnp.float32))
    _fetch(g.poses)  # block_until_ready is a no-op on the tunnel: force completion so
    # the solve timings below don't absorb the graph-construction dispatches
    return g


def bench_device_f64_probe():
    """Can the TPU compile an f64 linear solve at all? Probed in a SUBPROCESS (the
    x64 flag is process-global and must not contaminate the bench). Settles VERDICT
    r04 item 1's device-vs-host question with direct evidence: on this stack f64
    elementwise/matmul compile but f64 linalg (LU/triangular solve) does NOT
    (remote_compile HTTP 500, tpu_compile_helper exit 1) — so a device-resident f64
    pose-graph solve is not buildable, and the host f64 tier is the only
    GTSAM-precision option (`graph_based_slam.hpp:38-46` runs f64 throughout)."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import jax.numpy as jnp\n"
        "try:\n"
        "    r = jax.jit(lambda a: jnp.linalg.solve(a, a))(jnp.eye(6, dtype=jnp.float64) * 2)\n"
        "    jax.device_get(r)\n"
        "    print('OK')\n"
        "except Exception as e:\n"
        "    print('FAIL', type(e).__name__)\n"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=600).stdout.strip()
    except Exception as e:  # noqa: BLE001
        out = f"FAIL probe {type(e).__name__}"
    return {
        "f64_linalg_solve_compiles": out.startswith("OK"),
        "probe_result": out.splitlines()[-1] if out else "no output",
    }


def bench_pose_graph():
    """Wall time of the engine's public solve (`solver.solve_incremental`) cold/warm.

    `warm_ms` includes one device fetch (the public API pulls the graph off-device);
    `warm_host_ms` is the engine's production path — `GraphBasedSLAM._run_optimize`
    solves from host factor mirrors with ZERO device reads, so its warm re-solve is
    pure host f64 (one separator-direct iteration).

    `cold_ms` excludes one-time jit compiles (r05): a throwaway solve on an
    identical-shape graph runs first, absorbing the per-shape graph fetch/write
    helper compiles (~1 s on the remote compile service) that previously landed in
    whichever cell ran first for each K — rounds 1-4's cold cells are therefore
    compile-inflated. The solve itself is purely functional, so the warm-up does
    not change the timed graph. The f64 algebra measures ~150 ms for 3 iterations
    at K=4096 on this host, max_run-insensitive (measured against refine64.refine)."""
    import jax

    from lidar_graph_slam_tpu.graph import refine64, solver

    out = {}
    for K in (1024, 4096):
        for L in (8, 64):
            rng = np.random.default_rng(0)
            g = _build_bench_graph(K, L, rng)
            cold_poses = np.asarray(jax.device_get(g.poses))

            # Shape warm-up (compile excluded, like every other stage): the solve is
            # functional, so this does not change `g`.
            solver.solve_incremental(g)
            t0 = time.perf_counter()
            g_solved, info_cold = solver.solve_incremental(g)
            cold_ms = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter()
            g_solved, info_warm = solver.solve_incremental(g_solved)
            warm_ms = (time.perf_counter() - t0) * 1e3
            # Engine-path warm solve: host mirrors, no fetch (what a loop closure
            # actually pays inside the pipeline).
            view = refine64.GraphView.from_device_graph(g_solved)
            t0 = time.perf_counter()
            _, info_host = solver.escalate_f64(view, device_lm=lambda p: p)
            warm_host_ms = (time.perf_counter() - t0) * 1e3

            rec = {
                "cold_ms": round(cold_ms, 2),
                "warm_ms": round(warm_ms, 2),
                "warm_host_ms": round(warm_host_ms, 2),
                "cold_iters_f64": info_cold["iterations"],
                "warm_iters_f64": info_warm["iterations"],
                "device_lm_used_cold": bool(info_cold["device_lm"]),
                "final_cost_f64": round(info_cold["final_cost"], 6),
            }
            if K == 1024:
                # Device-f32-LM-only comparison point (one jitted dispatch,
                # fetch-synced). Only at K=1024: each (K, L) shape is a separate
                # multi-minute remote compile of the full LM program, and the
                # f32-vs-f64 accuracy contrast is fully visible here (the K=4096
                # f32 floor is documented in scripts/diag_warm.py + refine64.py).
                import jax.numpy as jnp
                opt = lambda gg: solver.optimize(gg, max_iterations=15).poses  # noqa: E731
                _fetch(opt(g.replace(poses=jnp.asarray(cold_poses))))  # compile
                t0 = time.perf_counter()
                p32 = opt(g.replace(poses=jnp.asarray(cold_poses)))
                _fetch(p32)
                rec["device_f32lm_only_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
                rec["final_cost_f32lm"] = round(float(_fetch(solver.graph_cost(
                    g, jnp.asarray(np.asarray(jax.device_get(p32)))))), 3)
            out[f"K{K}_L{L}"] = rec
    return out


# --- end-to-end pipeline ------------------------------------------------------------------


def _run_pipeline(scans, enable_loop_closure=True, pipeline_depth=1):
    from lidar_graph_slam_tpu.core.config import PipelineConfig, apply_cli_overrides
    from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline

    cfg = PipelineConfig()
    if not enable_loop_closure:
        cfg = apply_cli_overrides(cfg, ["enable_loop_closure=False"])
    if pipeline_depth != 1:
        cfg = apply_cli_overrides(cfg, [f"pipeline_depth={pipeline_depth}"])
    pipe = SlamPipeline(cfg)
    pipe.process_scan(scans[0])
    frame_walls = []
    t0 = time.perf_counter()
    for s in scans[1:]:
        a = time.perf_counter()
        pipe.process_scan(s)
        frame_walls.append(time.perf_counter() - a)
    pipe.flush()
    dt = time.perf_counter() - t0
    res = pipe.result()
    return pipe, res, frame_walls, dt


def _accuracy(res, gt_poses):
    from lidar_graph_slam_tpu.utils.evaluation import ate_rmse, rpe

    n = res.odometry_poses.shape[0]
    T0_inv = np.linalg.inv(gt_poses[0])
    gt = np.stack([(T0_inv @ p).astype(np.float32) for p in gt_poses[:n]])
    kf_gt = gt[res.keyframe_frame_indices]
    t_rpe, r_rpe = rpe(res.odometry_poses, gt)
    return {
        "ate_odometry_m": round(ate_rmse(res.odometry_poses, gt, align=False), 3),
        "ate_keyframes_m": round(ate_rmse(res.keyframe_poses, kf_gt, align=False), 3),
        "rpe_trans_m": round(t_rpe, 4),
        "rpe_rot_rad": round(r_rpe, 5),
    }


def bench_e2e(n_frames=360):
    """Full pipeline on a THREE-lap DRIFT-REGIME course: accuracy with loop closure on
    and off, plus throughput. ~1.9 m per frame over 3.05 laps of a sparse (~9k
    pts/frame) world — sparse geometry makes the NDT odometry genuinely drift
    (~0.26 m ATE over ~660 m), so the recorded loop_on/loop_off A/B exercises what
    the back end is FOR (VERDICT r04 item 5: the old dense 2-lap course had mm-level
    RPE and loops were accuracy-neutral on it; measured here after the r05 loop
    fixes — full-coverage submap subsampling + PCL-semantics gate — loops cut
    keyframe ATE 0.265 -> 0.139 on this course (25 loops) and 0.274 -> 0.161 on the
    400-frame at-scale run (28/28 attempts accepted),
    docs/at_scale_3laps_400frames.json). Dense-load throughput is measured separately
    by bench_e2e_dense. Every keyframe rebuilds the submap — the reference's worst
    case, `lidar_scan_matcher.cpp:199-212`."""
    from lidar_graph_slam_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(
        n_frames=n_frames, seed=1, extent=60.0, radius=35.0, max_points=131072,
        noise=0.02, laps=3.05, n_azimuth=2048, n_elevation=64,
    )
    scans, gts = [], []
    for scan, gt in seq:
        scans.append(scan)
        gts.append(gt)
    gt_poses = np.stack(gts)
    mean_pts = float(np.mean([s.shape[0] for s in scans]))

    pipe, res, frame_walls, dt = _run_pipeline(scans, enable_loop_closure=True)
    med = float(np.median(frame_walls))
    out = {
        "steady_fps": round(1.0 / max(med, 1e-9), 2),
        "full_run_fps_cold": round((n_frames - 1) / dt, 2),
        "mean_raw_points": int(mean_pts),
        "keyframes": int(res.keyframe_poses.shape[0]),
        "loops_accepted": int(res.num_loop_closures),
        "loop_on": _accuracy(res, gt_poses),
    }
    # Warm-cache full run: same shapes, compiled programs reused (VERDICT r03 item 8).
    _, res2, _, dt2 = _run_pipeline(scans, enable_loop_closure=True)
    out["full_run_fps_warm"] = round((n_frames - 1) / dt2, 2)
    # Loop-closure-off A/B (VERDICT r03 item 1).
    _, res_off, _, _ = _run_pipeline(scans, enable_loop_closure=False)
    out["loop_off"] = _accuracy(res_off, gt_poses)
    return out


def _run_pipeline_cfg(scans, overrides):
    from lidar_graph_slam_tpu.core.config import PipelineConfig, apply_cli_overrides
    from lidar_graph_slam_tpu.pipeline.runner import SlamPipeline

    cfg = apply_cli_overrides(PipelineConfig(), overrides)
    pipe = SlamPipeline(cfg)
    pipe.process_scan(scans[0])
    frame_walls = []
    for s in scans[1:]:
        a = time.perf_counter()
        pipe.process_scan(s)
        frame_walls.append(time.perf_counter() - a)
    pipe.flush()
    return pipe.result(), frame_walls


def bench_e2e_dense(n_frames=40):
    """Steady fps at HDL-64-class point load (urban-canyon world, ~70-90k pts/frame).

    `steady_fps` is the HIGH-LOAD OPERATING POINT: map_build_stride=2 (the 2 m voxel
    Gaussians keep hundreds of samples per voxel; keyframe ATE unchanged on the drift
    course, RPE +10%) and pipeline_depth=2 (one more frame in flight hides one tunnel
    round trip; the submap ring lags 2 frames). `defaults_fps` is the untouched
    accuracy-first default config on the same scans — both recorded so the tuning is
    visible, not hidden. Frame-wall decomposition (bench frame_budget + driver-stage
    p50s): the per-frame wall is ~entirely the fetch-wait for the frame's results
    (r05 stage p50s on the tunnel: dispatch 3 ms, fetch-wait 128-173 ms, backend
    2 ms vs ~70 ms device compute: step ~36 + keyframe rebuild ~34) — an end-to-end
    tunnel-latency floor, not bytes and not device time.

    Two optimizations were TRIED AND REJECTED against this floor (r05, measured on
    the real chip; recorded here so they are not rediscovered):
      * int16@5mm upload quantization (halves the 1.5 MB/frame raw-scan upload):
        ZERO e2e change (5.64 vs 5.70 fps defaults; tuned point equal) even though a
        standalone serial upload+sync microbenchmark suggested ~17 MB/s link — the
        driver's async dispatch already overlaps the upload, and on real (PCIe) TPU
        hosts the upload was never the bottleneck. Deleted per the no-unmeasured-
        complexity rule.
      * deeper pipelining (depth sweep 2/4/6 at stride 2): 7.2 -> 8.4 -> 9.3 fps but
        keyframe-lagged submaps cost real tracking accuracy (ATE 0.89 -> 1.14 ->
        2.44 m on the 40-frame canyon course) — past depth 2 the trade is bad."""
    from lidar_graph_slam_tpu.io.synthetic import (
        SyntheticSequence, make_world, simulate_scan)

    rng = np.random.default_rng(2)
    world = make_world(rng, extent=60.0, density=60.0, wall_height=12.0,
                       box_height=(6.0, 25.0), n_boxes=60)
    seq = SyntheticSequence(n_frames=n_frames, seed=2, radius=35.0, laps=0.25,
                            max_points=131072, n_azimuth=2048, n_elevation=64)
    scans = [
        simulate_scan(world, seq.poses[i], rng, max_points=131072,
                      n_azimuth=2048, n_elevation=64)
        for i in range(n_frames)
    ]
    mean_pts = float(np.mean([s.shape[0] for s in scans]))
    _, walls_tuned = _run_pipeline_cfg(scans, [
        "enable_loop_closure=False", "scan_matcher.map_build_stride=2",
        "pipeline_depth=2"])
    _, walls_default = _run_pipeline_cfg(scans, ["enable_loop_closure=False"])
    return {
        "steady_fps": round(1.0 / max(float(np.median(walls_tuned)), 1e-9), 2),
        "operating_point": "map_build_stride=2 pipeline_depth=2",
        "defaults_fps": round(1.0 / max(float(np.median(walls_default)), 1e-9), 2),
        "mean_raw_points": int(mean_pts),
    }


def bench_kitti():
    """KITTI odometry branch — runs only when $KITTI_ROOT exists with sequence 00."""
    root = os.environ.get("KITTI_ROOT", "/data/kitti")
    seq_dir = os.path.join(root, "sequences", "00")
    if not os.path.isdir(seq_dir):
        return None
    from lidar_graph_slam_tpu.io.kitti import KittiSequence

    seq = KittiSequence(root, "00", max_frames=500, max_points=131072)
    scans = [s for s, _ in seq]
    pipe, res, frame_walls, dt = _run_pipeline(scans, enable_loop_closure=True)
    out = {
        "frames": len(scans),
        "steady_fps": round(1.0 / max(float(np.median(frame_walls)), 1e-9), 2),
        "loops_accepted": int(res.num_loop_closures),
    }
    if seq.gt_poses is not None:
        out.update(_accuracy(res, np.asarray(seq.gt_poses)))
    return out


# --- kernel roofline ----------------------------------------------------------------------


def bench_accumulation():
    """The GN inner-loop accumulation, standalone, plus the r05 kernel decision record.

    Round 5 DELETED the hand-written Pallas accumulation kernel: the end-to-end A/B on
    the real chip (same fixture, same session) measured the XLA path FASTER — 44.2
    frames/s (XLA) vs 38.7 (Pallas) scan-to-submap NDT — on top of the r04 roofline
    showing the kernel at ~2% of streaming bandwidth behind an input relayout costing
    more than the kernel itself. Complexity without a measured win is debt
    (`ops/pallas_kernels.py` module docstring carries the full record)."""
    import jax
    import jax.numpy as jnp

    from lidar_graph_slam_tpu.ops import pallas_kernels

    fo = _measure_fetch_overhead()
    n = 16384 * 7  # one front-end iteration's correspondence count
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ic = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    ic = ic + jnp.asarray(rng.normal(scale=0.01, size=(n, 3, 3)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    m = jnp.asarray(rng.random(n) > 0.1)
    acc = jax.jit(pallas_kernels.ndt_accumulate_xla)
    t_k = _timeit(lambda: acc(e, ic, p, m, 1.0, 1.0), n=30, fetch_overhead=fo)
    return {
        "backend": "xla",
        "ms": round(t_k * 1e3, 4),
        "pallas_kernel": "deleted r05 (lost the e2e A/B: 44.2 fps XLA vs 38.7 pallas)",
    }


def _retry(stage_fn, label):
    """One retry per stage: the remote compile service intermittently returns HTTP 500
    mid-compile (observed ~once per hour of benching); a transient must not void the
    whole record. Diagnostics go to stderr — stdout stays the single JSON line."""
    import sys

    try:
        return stage_fn()
    except Exception as e:  # noqa: BLE001 — deliberately broad: record > purity
        print(f"[bench] {label} failed ({e!r}); retrying once", file=sys.stderr)
        return stage_fn()


def main():
    from lidar_graph_slam_tpu.utils.jit_cache import enable_compilation_cache

    # f64 probe FIRST, before this process opens its own TPU session — two live TPU
    # processes starve each other on the tunneled backend (verify skill).
    device_f64 = _retry(bench_device_f64_probe, "device_f64")

    enable_compilation_cache()

    fo = _measure_fetch_overhead()
    fps, headline_iters = _retry(lambda: bench_scan_match(fetch_overhead=fo),
                                 "scan_match")
    extra = {
        "fetch_overhead_ms": round(fo * 1e3, 2),
        "headline_mean_iters": round(headline_iters, 1),
        "scan_match_ab": _retry(lambda: bench_scan_match_ab(fetch_overhead=fo),
                                "scan_match_ab"),
        "pose_graph_solve_ms": _retry(bench_pose_graph, "pose_graph"),
        "device_f64": device_f64,
        "e2e_pipeline": _retry(bench_e2e, "e2e"),
        "e2e_dense": _retry(bench_e2e_dense, "e2e_dense"),
        "frame_budget": _retry(lambda: bench_frame_budget(fetch_overhead=fo),
                               "frame_budget"),
        "ndt_accumulate": _retry(bench_accumulation, "accumulation"),
    }
    kitti = _retry(bench_kitti, "kitti")
    if kitti is not None:
        extra["kitti"] = kitti
    print(json.dumps({
        "metric": "scan_match_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
