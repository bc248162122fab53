"""Generalized ICP (distribution-to-distribution) — fast_gicp equivalent.

Replaces `fast_gicp::FastGICP` and `pcl::GeneralizedIterativeClosestPoint` (the front end's
optional matchers, factory at `lidar_scan_matcher/src/lidar_scan_matcher.cpp:37-96`):
per-point covariances from k = `correspondence_randomness` (20) nearest neighbors
(`:43,48`), correspondence gating by max distance (`:51`), plane-to-plane Mahalanobis cost.

TPU design: covariance estimation is a batched grid-kNN gather + one einsum per cloud (done
once, not per iteration), regularized fast_gicp-style by snapping eigenvalues to (1, 1, 1e-3)
— every surface patch is treated as a plane with fixed conditioning. The per-iteration
combined metric M = (C_q + R C_p R^T)^{-1} is a closed-form batched 3x3 inverse; normal
equations accumulate through the same einsum path as NDT.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from lidar_graph_slam_tpu.core import se3
from lidar_graph_slam_tpu.ops.neighbors import (
    HashGrid,
    build_hash_grid,
    nearest,
    window_covariances,
)
from lidar_graph_slam_tpu.ops import pallas_kernels
from lidar_graph_slam_tpu.registration.base import RegistrationResult, solve_damped


def _inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse via adjugate (no LU factorization kernels)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


@partial(jax.jit, static_argnames=("k", "window"))
def estimate_covariances(
    points: jax.Array, mask: jax.Array, cell_size, k: int = 20, window: int = 16
):
    """fast_gicp 'PLANE'-regularized covariances with eigenvalues snapped to (1, 1, 1e-3).

    The scatter matrix comes from the sorted-grid sliding window (same-cell neighbors are
    consecutive after the key sort — zero gathers) rather than an exact k-NN set; the
    eigenvalue regularization erases the difference (only the principal directions
    survive). `k` is kept for interface parity with fast_gicp's correspondence_randomness.
    Returns (covs [N, 3, 3] in the ORIGINAL row order, valid [N])."""
    del k
    grid = build_hash_grid(points, mask, cell_size)
    mu_s, cov_s, cnt_s = window_covariances(grid, window=window)

    ok_s = cnt_s >= 5.0
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), cov_s.shape)
    cov_safe = jnp.where(ok_s[:, None, None], cov_s, eye)
    from lidar_graph_slam_tpu.ops.voxel import _eigh3x3  # batched-3x3-fast Jacobi

    wvals, V = _eigh3x3(cov_safe)
    target = jnp.array([1e-3, 1.0, 1.0], dtype=points.dtype)  # ascending eigenvalue order
    cov_reg = (V * target[None, None, :]) @ jnp.swapaxes(V, -1, -2)
    cov_reg = jnp.where(ok_s[:, None, None], cov_reg, eye)

    # Back to original row order.
    n = points.shape[0]
    covs = jnp.zeros((n, 3, 3), points.dtype).at[grid.order].set(cov_reg)
    ok = jnp.zeros((n,), bool).at[grid.order].set(ok_s)
    return covs, ok & mask


@struct.dataclass
class GicpTarget:
    """Pre-built GICP target: NN grid + plane-regularized covariances (sorted order)."""

    grid: HashGrid
    covs: jax.Array   # [N, 3, 3] aligned with grid.points
    valid: jax.Array  # [N]


def build_gicp_target(points, mask, cell_size, k: int = 20) -> GicpTarget:
    grid = build_hash_grid(points, mask, cell_size)
    sorted_mask = grid.keys != jnp.iinfo(jnp.int32).max
    covs, ok = estimate_covariances(grid.points, sorted_mask, cell_size, k=k)
    return GicpTarget(grid=grid, covs=covs, valid=ok)


@partial(jax.jit, static_argnames=("max_iterations", "k", "bucket_cap", "reciprocal",
                                   "neighborhood"))
def gicp_align(
    target: GicpTarget,
    source_points: jax.Array,
    source_mask: jax.Array,
    init_transform: jax.Array,
    source_covs: jax.Array,
    max_correspondence_distance: float = 2.0,
    transform_epsilon: float = 0.01,
    max_iterations: int = 64,
    k: int = 20,
    bucket_cap: int = 32,
    reciprocal: bool = False,
    source_grid: HashGrid | None = None,
    neighborhood: int = 7,
) -> RegistrationResult:
    """Plane-to-plane GICP: minimize sum e^T (C_q + R C_p R^T)^-1 e over SE(3).

    `reciprocal=True` reproduces PCL's `setUseReciprocalCorrespondences` (the reference's
    GICP option, `lidar_scan_matcher.cpp:84-85,90`): a pair (p_i -> q_j) survives only if
    q_j's nearest neighbor among the transformed source points is p_i. NN distance is
    rigid-invariant, so the backward query runs in the SOURCE frame against a grid built
    once from the untransformed source (`source_grid`, required when reciprocal).

    `neighborhood=7` (default) searches the face-adjacent cell ring — the same trade
    the ICP loop verifier makes (graph/slam.py): with a previous-frame (odometry) or
    pre-aligned (verification) guess, true correspondences sit well within a cell, and
    the 27-cell ring costs ~4x the candidate volume per iteration for corner-case pairs
    the `max_correspondence_distance` gate would mostly reject anyway (the r05 A/B on
    the bench fixture: <= 1.1 cm transform delta — half the sensor noise — at 3.6x the
    frame rate, 0.9 -> 3.2 fps). Pass 27 for the exhaustive one-ring guarantee."""
    corr2 = max_correspondence_distance * max_correspondence_distance
    n = source_points.shape[0]
    if reciprocal and source_grid is None:
        raise ValueError("reciprocal=True requires source_grid")

    def body(carry):
        T, done, iters, _f, _n = carry
        R = T[:3, :3]
        p = se3.transform_points(T, source_points)
        idx, d2, found = nearest(target.grid, p, bucket_cap=bucket_cap,
                                 neighborhood=neighborhood)
        matched = found & source_mask & (d2 < corr2) & target.valid[idx]
        if reciprocal:
            # Backward NN in the source frame: T^{-1} q against the static source grid.
            q_back = se3.transform_points(se3.inverse(T), target.grid.points[idx])
            bidx, _bd2, bfound = nearest(source_grid, q_back, bucket_cap=bucket_cap,
                                         neighborhood=neighborhood)
            back_orig = source_grid.order[bidx]  # sorted row -> original source row
            matched = matched & bfound & (back_orig == jnp.arange(n, dtype=back_orig.dtype))

        q = target.grid.points[idx]
        Cq = target.covs[idx]
        Cp_rot = jnp.einsum("ij,njk,lk->nil", R, source_covs, R)
        M = _inv3x3(Cq + Cp_rot)
        e = p - q
        # Same accumulation as NDT: with d2 = 0 the Magnusson weight degenerates to
        # the match mask, leaving the plain GICP normal equations.
        H, g, _sw, n_hit = pallas_kernels.ndt_accumulate_xla(e, M, p, matched, 0.0, 1.0)
        n_inl = n_hit.astype(jnp.int32)

        delta = solve_damped(H, g, jnp.asarray(1e-6, H.dtype))
        ok = jnp.isfinite(delta).all() & (n_inl >= 6)
        delta = jnp.where(ok, delta, 0.0)
        T_new = se3.se3_exp(delta) @ T

        fitness = jnp.sum(jnp.where(matched, d2, 0.0)) / jnp.maximum(n_inl, 1)
        newly_done = jnp.linalg.norm(delta) < transform_epsilon
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
    # PCL parity (see ndt.py / icp.py): max-iterations stop counts as converged; quality
    # is gated by inlier count and the caller's health gate, not the stop reason.
    converged = (done | (iters >= max_iterations)) & (n_inl >= 6) & jnp.isfinite(T).all()
    return RegistrationResult(
        transform=T, converged=converged, iterations=iters, fitness=fitness, num_inliers=n_inl
    )


def make_gicp_matcher(cfg, cell_size: float = 2.0):
    """Matcher closures (build_target, align_with_source_covs) for the front end factory.

    Note: unlike NDT/ICP, GICP needs per-source covariances; the front end computes them
    once per scan with `estimate_covariances` and passes them through."""

    def build_target(points, mask):
        return build_gicp_target(points, mask, cell_size, k=cfg.correspondence_randomness)

    def align(target, points, mask, init_T, source_covs):
        source_grid = (
            build_hash_grid(points, mask, cfg.max_correspondence_distance)
            if cfg.use_reciprocal
            else None
        )
        return gicp_align(
            target,
            points,
            mask,
            init_T,
            source_covs,
            max_correspondence_distance=cfg.max_correspondence_distance,
            transform_epsilon=cfg.transform_epsilon,
            max_iterations=cfg.max_iterations,
            k=cfg.correspondence_randomness,
            reciprocal=cfg.use_reciprocal,
            source_grid=source_grid,
        )

    return build_target, align
