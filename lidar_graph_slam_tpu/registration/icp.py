"""Point-to-point ICP — the back end's loop-closure verifier.

Replaces `pcl::IterativeClosestPoint` as configured (hardcoded) by the reference's loop
pipeline: correspondence distance 30 m, 100 iterations, epsilon 1e-8/1e-6, RANSAC off
(`graph_based_slam/src/graph_based_slam.cpp:142-151`), invoked with target=candidate submap,
source=latest keyframe cloud, identity initial guess (`:315-318`). Its fitness score (mean
squared correspondence distance, PCL `getFitnessScore`) gates loop acceptance (`:328`) and
scales the loop factor's noise (`:335-339`), so the same quantity is produced here.

TPU design: correspondences come from the sorted-grid NN (one binary search + bounded gather
per point — no kd-tree), and each iteration applies the *closed-form* optimal rigid motion
(weighted Umeyama/Kabsch via a 3x3 SVD) rather than an incremental gradient step: one
cross-covariance einsum over all correspondences (MXU-shaped) and one tiny SVD per
iteration. Unmatched source points contribute a capped penalty to fitness so a grossly
misaligned pair cannot fake a good score just because few points matched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_graph_slam_tpu.core import se3
from lidar_graph_slam_tpu.ops.neighbors import HashGrid, build_hash_grid, nearest
from lidar_graph_slam_tpu.registration.base import RegistrationResult


def _umeyama_step(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Optimal R, t minimizing sum w ||R src + t - dst||^2 (closed form)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    # Cross-covariance: single MXU-shaped contraction over the point axis.
    Sigma = jnp.einsum("ni,nj,n->ij", dc, sc, w) / wsum
    U, _, Vt = jnp.linalg.svd(Sigma)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=src.dtype)).at[2, 2].set(det)
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    return R, t


@partial(jax.jit, static_argnames=("max_iterations", "euclidean_fitness_epsilon",
                                   "bucket_cap", "neighborhood"))
def icp_align(
    target_grid: HashGrid,
    source_points: jax.Array,
    source_mask: jax.Array,
    init_transform: jax.Array,
    max_correspondence_distance: float = 2.0,
    max_iterations: int = 50,
    transform_epsilon: float = 1e-6,
    euclidean_fitness_epsilon: float = 0.0,
    bucket_cap: int = 32,
    neighborhood: int = 27,
) -> RegistrationResult:
    """Align masked source points to a pre-built target grid. Returns source->target.

    The grid's cell size bounds the NN search radius (one cell ring); pass a grid built
    with cell_size >= max_correspondence_distance for faithful wide-basin behavior.

    `euclidean_fitness_epsilon` reproduces PCL DefaultConvergenceCriteria's absolute-MSE
    stop (`setEuclideanFitnessEpsilon`, wired by the reference at
    `graph_based_slam.cpp:148`): iteration stops when the fitness change between
    consecutive iterations falls below it. 0 disables.
    """
    corr2 = max_correspondence_distance * max_correspondence_distance

    def body(carry):
        T, done, iters, fitness_prev, _n = carry
        p = se3.transform_points(T, source_points)
        idx, d2, found = nearest(target_grid, p, bucket_cap=bucket_cap,
                                 neighborhood=neighborhood)
        matched = found & source_mask & (d2 < corr2)
        w = matched.astype(p.dtype)
        q = target_grid.points[idx]
        R, t = _umeyama_step(p, q, w)
        delta_T = se3.make_transform(R, t)
        n_inl = jnp.sum(matched.astype(jnp.int32))
        ok = (n_inl >= 3) & jnp.isfinite(delta_T).all()
        delta_T = jnp.where(ok, delta_T, jnp.eye(4, dtype=p.dtype))
        T_new = delta_T @ T

        # PCL-style fitness: mean squared NN distance over valid source points; points with
        # no neighbor in the search ring contribute the capped search radius squared.
        pen = jnp.asarray(corr2, p.dtype)
        per_pt = jnp.where(found, jnp.minimum(d2, pen), pen)
        nvalid = jnp.maximum(jnp.sum(source_mask), 1)
        fitness = jnp.sum(jnp.where(source_mask, per_pt, 0.0)) / nvalid

        step = se3.se3_log(delta_T)
        newly_done = jnp.linalg.norm(step) < transform_epsilon
        if euclidean_fitness_epsilon > 0.0:
            newly_done = newly_done | (
                jnp.abs(fitness_prev - fitness) < euclidean_fitness_epsilon
            )
        return T_new, done | newly_done, iters + 1, fitness, n_inl

    def cond(carry):
        _, done, iters, _, _ = carry
        return jnp.logical_not(done) & (iters < max_iterations)

    init = (
        init_transform.astype(source_points.dtype),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, source_points.dtype),
        jnp.asarray(0, jnp.int32),
    )
    T, done, iters, fitness, n_inl = jax.lax.while_loop(cond, body, init)
    # PCL parity: `hasConverged()` is true whenever DefaultConvergenceCriteria stopped the
    # loop — epsilon OR max-iterations (the latter is not a failure state by default,
    # `graph_based_slam.cpp:320-328` relies on the fitness gate to reject bad loops). We
    # additionally require a valid final solve (>=3 inliers, finite transform).
    converged = (done | (iters >= max_iterations)) & (n_inl >= 3) & jnp.isfinite(T).all()
    return RegistrationResult(
        transform=T, converged=converged, iterations=iters, fitness=fitness, num_inliers=n_inl
    )


@partial(jax.jit, static_argnames=("bucket_cap", "neighborhood", "mode"))
def fitness_score(
    target_grid: HashGrid,
    points: jax.Array,
    mask: jax.Array,
    transform: jax.Array,
    max_range: float,
    bucket_cap: int = 16,
    neighborhood: int = 27,
    mode: str = "penalized",
) -> jax.Array:
    """Loop-gate fitness, computed uniformly for every verifier method. The reference gates
    loop acceptance on PCL `getFitnessScore` (`graph_based_slam.cpp:328`) and scales the
    loop factor's noise with it (`:335-339`).

    mode="penalized" (default): mean squared NN distance over ALL valid source points,
      capped at max_range^2; unmatched points contribute the cap. A grossly misaligned pair
      cannot fake a good score just because few points matched (anti-gaming hardening the
      reference lacks).
    mode="pcl": exact `getFitnessScore(max_range)` semantics — mean squared distance over
      MATCHED points only (NN distance < max_range), uncapped; +inf when nothing matches
      (PCL returns std::numeric_limits<double>::max()). Use for reference-parity tuning of
      the 0.3 gate. Note the grid still bounds the NN search to one cell ring, so
      max_range is effectively min(max_range, cell_size)."""
    score, _frac = fitness_and_match_fraction(
        target_grid, points, mask, transform, max_range,
        bucket_cap=bucket_cap, neighborhood=neighborhood, mode=mode)
    return score


def fitness_and_match_fraction(
    target_grid: HashGrid,
    points: jax.Array,
    mask: jax.Array,
    transform: jax.Array,
    max_range: float,
    bucket_cap: int = 16,
    neighborhood: int = 27,
    mode: str = "penalized",
):
    """(fitness, matched-source fraction) from ONE NN query.

    The fraction is the anti-gaming backstop for the "pcl" mode: matched-only
    fitness can read arbitrarily low from a handful of coincidental matches, so the
    loop gate pairs it with a minimum matched fraction
    (`GraphSlamConfig.min_loop_match_fraction`)."""
    p = se3.transform_points(transform, points)
    _, d2, found = nearest(target_grid, p, bucket_cap=bucket_cap, neighborhood=neighborhood)
    pen = jnp.asarray(max_range * max_range, p.dtype)
    matched = found & mask & (d2 < pen)
    frac = jnp.sum(matched) / jnp.maximum(jnp.sum(mask), 1)
    if mode == "pcl":
        n = jnp.sum(matched)
        score = jnp.where(
            n > 0,
            jnp.sum(jnp.where(matched, d2, 0.0)) / jnp.maximum(n, 1),
            jnp.asarray(jnp.inf, p.dtype),
        )
        return score, frac
    if mode != "penalized":
        raise ValueError(f"unknown fitness mode {mode!r}")
    per_pt = jnp.where(found, jnp.minimum(d2, pen), pen)
    nvalid = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_pt, 0.0)) / nvalid, frac


def make_icp_matcher(cfg, cell_size: float = 2.0):
    """Matcher closures (build_target, align) mirroring the PCL interface usage."""

    def build_target(points, mask):
        return build_hash_grid(points, mask, cell_size)

    def align(target_grid, points, mask, init_T):
        return icp_align(
            target_grid,
            points,
            mask,
            init_T,
            max_correspondence_distance=min(cfg.max_correspondence_distance, cell_size),
            max_iterations=cfg.max_iterations,
            transform_epsilon=max(cfg.transform_epsilon, 1e-7),
            # Odometry's previous-frame guess keeps true correspondences well within
            # a cell — same trade as the loop verifier and gicp_align (its docstring
            # has the measured A/B): ~4x fewer candidate distances per iteration.
            neighborhood=7,
        )

    return build_target, align
