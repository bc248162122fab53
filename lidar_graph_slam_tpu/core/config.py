"""Typed configuration tree + YAML loader + CLI overrides.

Reproduces the reference's full ROS 2 parameter surface (SURVEY.md §5.6) with the same knob
names where sensible:
  * prefilter:  `points_prefiltering/launch/points_prefiltering.launch.xml:2-13` and
    `src/points_prefiltering.cpp:40-51` (leaf_size, random_sample_num, mean_k, stddev,
    min/max_x/y/z crop box, min/max_distance_cloud).
  * front end:  `lidar_scan_matcher/config/lidar_scan_matcher.param.yaml:1-26`
    (registration_method, displacement, max_scan_accumulate_num, NDT/GICP knobs).
  * back end:   `graph_based_slam/config/graph_based_slam.param.yaml:1-29`
    (rate, search_key_frame_num, score_threshold, search_for_candidate_threshold,
    accumulate_distance_threshold, registration knobs).

Defaults below equal the reference defaults so the default-config trajectory is the implicit
baseline (BASELINE.md). TPU-only capacity knobs (static padded shapes) are grouped under
`CapacityConfig` — they have no reference counterpart because dynamic allocation hid them.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class CapacityConfig:
    """Static-shape capacities (XLA compiles one program per distinct capacity set)."""

    raw_points: int = 131072        # max points per raw scan
    filtered_points: int = 32768    # after prefiltering
    keyframe_points: int = 16384    # stored per keyframe
    # (The odometry target submap needs no capacity knob: the device ring is exactly
    # max_scan_accumulate_num x filtered_points by construction, odometry/scan_matcher.py.)
    loop_submap_points: int = 131072  # loop-closure candidate submap
    max_keyframes: int = 4096       # graph capacity
    voxel_capacity: int = 65536     # max occupied voxels in a voxel-grid build
    max_loop_factors: int = 128


@dataclass(frozen=True)
class PrefilterConfig:
    """points_prefiltering node (`points_prefiltering.cpp:65-87`)."""

    min_distance: float = 1.0        # ‖p‖ <= min dropped (`:102-112`)
    max_distance: float = 0.0        # declared-but-unused in reference (`:51`); 0 disables
    use_crop: bool = False           # crop() dormant in reference (`:73-74,89-100`)
    min_xyz: tuple = (-50.0, -50.0, -50.0)
    max_xyz: tuple = (50.0, 50.0, 50.0)
    leaf_size: float = 0.1           # VoxelGrid leaf (`launch.xml:2`)
    use_outlier_filter: bool = True
    mean_k: int = 30                 # SOR neighbors (`launch.xml:4`)
    stddev: float = 1.2             # SOR sigma multiplier (`launch.xml:5`)
    use_random_sampling: bool = False  # dormant in reference (`:123-130`)
    random_sample_num: int = 5000


@dataclass(frozen=True)
class NdtConfig:
    """ndt_omp knobs (`lidar_scan_matcher.cpp:55-72`; param.yaml:9-15)."""

    resolution: float = 2.0
    step_size: float = 0.1
    transform_epsilon: float = 0.01
    max_iterations: int = 64
    # DIRECT7 neighborhood (`lidar_scan_matcher.cpp:69`) is the only search mode we build.
    outlier_ratio: float = 0.55      # Magnusson mixture weight (ndt_omp default)
    # Coarse-to-fine extension (no reference counterpart): a first pass on a 2x-coarser
    # voxel map widens the convergence basin beyond ndt_omp's. 0 disables.
    coarse_resolution: float = 4.0
    coarse_iterations: int = 16
    # Source-point stride for the coarse stage. A 4 m voxel map is insensitive to point
    # density, so seeding the fine basin from every 4th point buys ~4x on the coarse
    # stage's gather+accumulate cost at no accuracy cost (the fine stage sees all points).
    coarse_subsample: int = 4


@dataclass(frozen=True)
class GicpConfig:
    """fast_gicp / PCL GICP knobs (`lidar_scan_matcher.cpp:37-96`)."""

    max_iterations: int = 64
    correspondence_randomness: int = 20   # k for covariance estimation (`:43,48`)
    max_correspondence_distance: float = 2.0  # (`:51`)
    transform_epsilon: float = 0.01
    # PCL setUseReciprocalCorrespondences (`:84-85,90`): keep (p->q) only when q's NN
    # among the transformed source points is p. Implemented via a backward query against
    # a static source-frame grid (registration/gicp.py).
    use_reciprocal: bool = False


@dataclass(frozen=True)
class IcpConfig:
    """PCL ICP as hardcoded for loop verification (`graph_based_slam.cpp:142-151`).

    max_correspondence_distance feeds the verifier's NN grid, capped at 2 m (the NDT
    pre-align stage replaces the reference's 30 m wide-net search — graph/slam.py
    documents the cap); values below 2 m are honored exactly.
    euclidean_fitness_epsilon is PCL's absolute-MSE convergence stop (`cpp:148`)."""

    max_correspondence_distance: float = 30.0
    max_iterations: int = 100
    transform_epsilon: float = 1e-8
    euclidean_fitness_epsilon: float = 1e-6


@dataclass(frozen=True)
class ScanMatcherConfig:
    """lidar_scan_matcher front end (`param.yaml:1-26`)."""

    registration_method: str = "NDT"  # NDT | GICP | ICP (reference: NDT_OMP | FAST_GICP | GICP)
    # Sensor->base extrinsic (x, y, z, roll, pitch, yaw): the reference resolves this via a
    # TF lookup with identity fallback (`lidar_scan_matcher.cpp:129-131,252-273`); here it
    # is explicit config, applied to every scan before registration.
    extrinsic_xyzrpy: tuple = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    displacement: float = 1.0         # keyframe trigger [m] (`param.yaml:5`)
    max_scan_accumulate_num: int = 20  # submap window [keyframes] (`param.yaml:6`)
    # Initial-guess model. The reference hardcodes constant-pose (previous pose,
    # `lidar_scan_matcher.cpp:165`); constant-velocity extrapolation is strictly more
    # robust at high per-frame motion and is our default. Set "constant_pose" for parity.
    # "constant_pose" is the reference's model (`lidar_scan_matcher.cpp:165`) and the
    # STABLE one: a velocity extrapolation doubles pose error into the next guess, and in
    # near-null directions of the registration score (along-track on feature-poor
    # geometry) the solver cannot remove it -> closed-loop gain ~2/frame amplifies any
    # perturbation exponentially. "constant_velocity" remains available for slow-motion /
    # high-overlap regimes where the wider effective basin matters more.
    initial_guess: str = "constant_pose"
    # Point stride for the submap NDT MAP BUILD (the registration source always uses
    # every point). The 2 m voxel Gaussians average hundreds of points per voxel even
    # at stride 2, and the build's sort + segment reductions over window*N rows are
    # the dominant keyframe-frame device cost at dense load (bench frame_budget).
    # 1 = build from every ring point (most conservative).
    map_build_stride: int = 1
    # Health gate (no reference counterpart — its only guard is hasConverged,
    # `lidar_scan_matcher.cpp:167-170`): a solver that reports convergence with fewer
    # than this fraction of source points matched is treated as a failed frame.
    min_inlier_fraction: float = 0.05
    ndt: NdtConfig = field(default_factory=NdtConfig)
    gicp: GicpConfig = field(default_factory=GicpConfig)


@dataclass(frozen=True)
class GlobalRegConfig:
    """FPFH + vectorized-RANSAC global registration (registration/features.py) — the
    reference's own roadmap TODO ("Scan Matching with FPFH", `README.md:33-39`).

    Known approximation: submap normals are oriented toward the single candidate-pose
    viewpoint, so surfaces observed from the far side of a large (±20 keyframe) submap
    can get sign-flipped normals, degrading FPFH match quality there. Benign in practice
    because loop candidates share a viewpoint with the submap center, and a failed global
    registration falls back to the identity guess."""

    keypoint_leaf: float = 1.0       # voxel leaf for keypoint extraction [m]
    normal_k: int = 16               # kNN for normal estimation
    fpfh_k: int = 32                 # kNN for SPFH/FPFH neighborhoods
    hypotheses: int = 2048           # RANSAC hypotheses (3-point + 1-point-yaw families)
    inlier_threshold: float = 1.0    # correspondence refine distance [m]
    min_occupancy: float = 0.5       # acceptance: fraction of src keypoints in occupied cells
    max_keypoints: int = 8192        # static keypoint capacity per cloud


@dataclass(frozen=True)
class GraphSlamConfig:
    """graph_based_slam back end (`param.yaml:1-29`, `graph_based_slam.cpp:27-155`)."""

    rate: float = 1.0                       # loop-search cadence [Hz] (`param.yaml:3`)
    # Frame-count analog of the reference's `rate` wall timer (`cpp:71-74`) — the
    # pipeline is deterministic per-frame, not wall-clock. <= 0 derives the period from
    # `rate` assuming the nominal 10 Hz sensor: period = round(10 / rate).
    loop_search_period_frames: int = 10
    search_key_frame_num: int = 20          # submap half-window ±20 (`param.yaml:4`)
    search_radius: float = 50.0             # dormant kd-tree detector's radius (`param.yaml:5`)
    score_threshold: float = 0.3            # ICP fitness accept gate (`param.yaml:6`)
    search_for_candidate_threshold: float = 15.0  # euclid gate [m] (`param.yaml:7`)
    accumulate_distance_threshold: float = 100.0  # accum-dist gate [m] (`param.yaml:8`)
    # Loop verifier (`param.yaml:9`; factory `graph_based_slam.cpp:77-155`). The reference
    # offers ICP (default) | FAST_GICP | GICP | NDT_OMP; here the two GICP variants collapse
    # into one solver, so the choices are ICP | GICP | NDT.
    registration_method: str = "ICP"
    loop_submap_leaf: float = 0.5           # voxel leaf for loop submap (`cpp:61,311-313`)
    # Loop-gate fitness semantics (registration/icp.py:fitness_score): "pcl" (default;
    # exact getFitnessScore parity: matched-only, uncapped — the quantity the
    # reference's 0.3 `score_threshold` was tuned against, `graph_based_slam.cpp:328`)
    # or "penalized" (unmatched source points contribute a capped penalty —
    # anti-gaming hardening). Default switched to "pcl" in r05: gating PENALIZED
    # scores with the reference's PCL-calibrated 0.3 threshold rejected GENUINE loops
    # whose viewpoints only partially overlap the candidate submap — a measured
    # at-scale pair read 0.44 penalized vs 0.067 pcl at ground-truth alignment, i.e.
    # the gate's meaning had silently changed. The robust loop kernel
    # (`loop_robust_delta`) guards the accepted-but-wrong case either way.
    fitness_mode: str = "pcl"
    # Anti-gaming backstop for the matched-only "pcl" fitness: a verification must
    # match at least this fraction of the source scan's points (NN within the
    # correspondence range) to count as converged — matched-only fitness from a
    # handful of coincidental matches can read arbitrarily low, and the factor's
    # information weight (1/fitness) would be extreme exactly when evidence is
    # sparsest. Genuine partial-overlap loops on the at-scale course matched ~40%;
    # 0 disables (exact reference behavior — it has no such backstop).
    min_loop_match_fraction: float = 0.15
    # The dormant kd-tree detector's 30 s temporal gate (`graph_based_slam.cpp:210`),
    # applied by detect_loop(mode="radius") when keyframes carry stamps. 0 disables.
    temporal_gate_sec: float = 30.0
    icp: IcpConfig = field(default_factory=IcpConfig)
    # Verifier knobs for the non-default methods (`graph_based_slam.cpp:82-119`). NDT runs
    # single-level here — the loop pipeline has its own fixed coarse pre-align stage.
    ndt: NdtConfig = field(default_factory=lambda: NdtConfig(
        resolution=2.0, max_iterations=32, coarse_resolution=0.0))
    gicp: GicpConfig = field(default_factory=GicpConfig)
    # Prior/odometry noise sigma^2 = [1e-6 x3 (rot), 1e-8, 1e-8, 1e-6 (trans)] (`cpp:67-69`).
    odom_noise_var: tuple = (1e-6, 1e-6, 1e-6, 1e-8, 1e-8, 1e-6)
    # Robust loop kernel: Geman-McClure scale [m] on the PHYSICAL 6-dof loop residual
    # (IRLS in the f64 solve tier, refine64._loop_weights; rotation counted at
    # 5 m/rad). The reference's loop noise is the naive fitness*I6
    # (`graph_based_slam.cpp:335-341`) with NO robustness — one
    # fitness-passing-but-wrong factor rewrites the whole trajectory. The kernel is
    # REDESCENDING: a factor disagreeing with the chain by >> delta meters loses its
    # pull entirely (~(delta/s)^4), while genuine factors correcting ~delta of drift
    # keep useful weight and recover w -> 1 as IRLS closes them. 0 disables (exact
    # reference parity). Proven by the poisoned-loop battery (tests/test_robust_loops.py).
    loop_robust_delta: float = 5.0
    # FPFH+RANSAC initial guess for loop verification (no reference counterpart — it uses
    # an identity guess at `graph_based_slam.cpp:318`, capped by the verifier's basin).
    use_global_init: bool = False
    global_reg: GlobalRegConfig = field(default_factory=GlobalRegConfig)
    # Concurrent back end (default on): loop verification is DISPATCHED at the cadence
    # tick and consumed `loop_verify_lag_frames` frames later (the device->host copy
    # rides copy_to_host_async meanwhile); the pose-graph solve runs in a worker thread
    # between frame dispatches. This is the reference's separate-process back end
    # (`graph_based_slam.cpp:71-74`, process registration `:503-504`) without its
    # two-mutex race: the thread only reads an immutable snapshot, and corrections are
    # applied between frames (deferred `adjust_pose` semantics, `:399-402`). False
    # restores the synchronous in-frame-loop behavior (exact per-frame determinism,
    # finer timing attribution).
    async_backend: bool = True
    loop_verify_lag_frames: int = 2
    # Candidates verified per loop attempt. The reference verifies only the nearest
    # (`graph_based_slam.cpp:264-280`); k > 1 verifies the k nearest gated candidates
    # (non-overlapping submaps) in ONE batched device dispatch and adds a factor for
    # every accepted one — strictly higher recall at ~the cost of one verification
    # (the batch rides the same program; on a mesh it shards over devices).
    loop_topk: int = 1


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh parallelism for the live pipeline (no reference counterpart — the reference's
    only scaling is OpenMP threads + three OS processes, SURVEY.md §2.3).

    With `use_mesh` on, SlamPipeline builds a `jax.sharding.Mesh` and routes:
      * the back-end pose-graph solve through the Schur-complement domain-decomposed
        block-tridiagonal solve (`parallel/schur.py`) — each device eliminates its
        contiguous pose segment, one psum of separator blocks rides ICI;
      * batched top-k loop verification (`GraphSlamConfig.loop_topk`) with the candidate
        batch axis sharded over the mesh.
    Identical trajectories to the single-chip path (same math, same factors) — verified
    by tests/test_pipeline_mesh.py on the 8-virtual-device CPU mesh."""

    use_mesh: bool = False
    mesh_devices: int = 0           # 0 = all local devices
    backend_solver: str = "schur"   # "schur" | "chain" (psum-reduced replicated solve)


@dataclass(frozen=True)
class PipelineConfig:
    prefilter: PrefilterConfig = field(default_factory=PrefilterConfig)
    scan_matcher: ScanMatcherConfig = field(default_factory=ScanMatcherConfig)
    graph_slam: GraphSlamConfig = field(default_factory=GraphSlamConfig)
    capacity: CapacityConfig = field(default_factory=CapacityConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    enable_loop_closure: bool = True
    dtype: str = "float32"
    # Fused front end: prefilter + align + keyframing + submap rebuild as ONE device
    # program with lagged host readback (odometry/fused.py). Numerically identical to the
    # classic per-stage driver; hides host<->device latency entirely. False falls back to
    # the stage-by-stage ScanMatcher driver (finer-grained per-stage timings).
    fused_frontend: bool = True
    # Frames kept in flight by the fused driver before the lagged readback. Depth d means
    # the submap ring lags a new keyframe by d frames. d=1 (default) is verified benign;
    # d=2 measured no throughput gain on the tunneled dev chip and costs tracking margin
    # on high-motion streams (the submap lags 2 frames), so raise it only on hosts whose
    # dispatch latency demonstrably dominates.
    pipeline_depth: int = 1


# --- loading / overrides ----------------------------------------------------------------


def _update_dataclass(obj: Any, updates: dict) -> Any:
    """Recursively apply a nested dict of overrides to a (frozen) dataclass tree."""
    kwargs = {}
    for key, value in updates.items():
        if not hasattr(obj, key):
            raise KeyError(f"unknown config key {key!r} for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _update_dataclass(current, value)
        else:
            if isinstance(current, tuple) and isinstance(value, list):
                value = tuple(value)
            kwargs[key] = value
    return dataclasses.replace(obj, **kwargs)


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> PipelineConfig:
    """Build a PipelineConfig from defaults, then a YAML file, then explicit overrides."""
    cfg = PipelineConfig()
    if path is not None:
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _update_dataclass(cfg, data)
    if overrides:
        cfg = _update_dataclass(cfg, overrides)
    return cfg


def apply_cli_overrides(cfg: PipelineConfig, pairs: list) -> PipelineConfig:
    """Apply `a.b.c=value` strings (CLI `--set`) onto the config tree."""
    import ast

    nested: dict = {}
    for pair in pairs:
        key, _, raw = pair.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = nested
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return _update_dataclass(cfg, nested)
