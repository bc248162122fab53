"""Pallas TPU kernels for the registration hot loop.

`ndt_accumulate` fuses the per-iteration core of NDT Gauss-Newton — residuals, Mahalanobis
distances, Magnusson exponential weights, and the 6x6 normal-equation reduction — into one
kernel. The XLA path materializes [K, 3, 6] Jacobian and [K, 3, 6] W·J intermediates
(~50 MB of HBM traffic per iteration at K = 16384*7 correspondences); the fused kernel
streams the packed correspondence rows once (~7 MB) and keeps every intermediate in VMEM
lanes. Analytic block structure (J = [-hat(p) | I]):

    H_ww = -P W P,  H_wv = P W,  H_vv = W,  g_w = p x (W e),  g_v = W e,   P = hat(p)

summed over correspondences with weight w = w_scale * exp(-0.5 d2 * e^T W e) * hit.

Layout: correspondences are packed lane-major ([component, K] with K a multiple of 128) so
the VPU streams (8, 128) tiles at full occupancy; the output accumulator lives in one
(8, 128) block indexed identically by every grid step (TPU grid steps run sequentially, so
in-place accumulation is race-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _cross(p, v):
    """Lane-wise cross product p x v for 3-lists of [tile] vectors."""
    return [
        p[1] * v[2] - p[2] * v[1],
        p[2] * v[0] - p[0] * v[2],
        p[0] * v[1] - p[1] * v[0],
    ]


def _ndt_accum_kernel(params_ref, e_ref, w_ref, p_ref, wm_ref, out_ref):
    """One grid step: accumulate the 44 reduced quantities over a [*, TILE] slab as
    PER-LANE partial sums.

    e_ref:  [3, T]  residuals (p - mu)
    w_ref:  [9, T]  inverse covariances, row-major (c00..c22)
    p_ref:  [3, T]  transformed source points (Jacobian anchor)
    wm_ref: [1, T]  hit mask (1.0 / 0.0)
    out_ref: [1, 48, 128] — this grid step's OWN output block: row q holds quantity
             q's 128 lane-partials for this tile. The cross-step and cross-lane
             reduces happen ONCE in XLA after the kernel ([grid, 48, 128] -> [48]).
             Rows 0..35 = H[i, j] row-major (i * 6 + j), 36..41 = g, 42 = sum of
             weights, 43 = hit count, 44..47 padding.

    WHY this layout (r04 rework): the previous kernel produced 44 SCALARS per grid
    step — 44 full cross-lane reduction trees plus 44 one-hot (8, 128) selects per
    step, which dominated the runtime at ~2% of streaming bandwidth. A [T] operand
    lives as (T/128, 128) native tiles, so reducing over the SUBLANE axis only is a
    handful of in-register adds per quantity; the expensive 128-lane tree is deferred
    to one reduce per CALL instead of 44 trees per STEP. Each step writes its OWN
    block (no accumulator read-modify-write): the RMW serialized the grid pipeline,
    measured 3x the dependent-chain latency of this form.
    """
    d2 = params_ref[0]
    w_scale = params_ref[1]

    T = e_ref.shape[1]
    rows = T // _LANES

    def lanes(v):
        # [T] -> [rows, 128] (the operand's native tiling) -> per-lane partial [128].
        return jnp.sum(v.reshape(rows, _LANES), axis=0)

    e = [e_ref[i, :] for i in range(3)]
    c = [w_ref[i, :] for i in range(9)]
    p = [p_ref[i, :] for i in range(3)]
    hit = wm_ref[0, :]

    # W rows (symmetric storage came in row-major, trust as-is).
    W = [[c[0], c[1], c[2]], [c[3], c[4], c[5]], [c[6], c[7], c[8]]]
    # We = W @ e
    We = [W[i][0] * e[0] + W[i][1] * e[1] + W[i][2] * e[2] for i in range(3)]
    md2 = e[0] * We[0] + e[1] * We[1] + e[2] * We[2]
    w = w_scale * jnp.exp(-0.5 * d2 * md2) * hit

    # g blocks.
    g_w = _cross(p, We)            # p x (W e)
    g_v = We

    # H blocks. Columns of P = hat(p): P[:,0] = (0, pz, -py), P[:,1] = (-pz, 0, px),
    # P[:,2] = (py, -px, 0).
    Pcol = [
        [jnp.zeros_like(p[0]), p[2], -p[1]],
        [-p[2], jnp.zeros_like(p[0]), p[0]],
        [p[1], -p[0], jnp.zeros_like(p[0])],
    ]
    # WP[:, j] = W @ P[:, j]
    WP = [[W[i][0] * Pcol[j][0] + W[i][1] * Pcol[j][1] + W[i][2] * Pcol[j][2]
           for j in range(3)] for i in range(3)]          # WP[i][j]
    # H_wv = P @ W: column j = p x W[:, j] (W symmetric: column j == row j).
    H_wv = [[None] * 3 for _ in range(3)]
    for j in range(3):
        col = _cross(p, [W[0][j], W[1][j], W[2][j]])
        for i in range(3):
            H_wv[i][j] = col[i]
    # H_ww = -P @ WP: column j = -(p x WP[:, j]).
    H_ww = [[None] * 3 for _ in range(3)]
    for j in range(3):
        col = _cross(p, [WP[0][j], WP[1][j], WP[2][j]])
        for i in range(3):
            H_ww[i][j] = -col[i]

    # Stack the 48 per-lane partial rows ([48, 128]) and accumulate into out_ref.
    parts = []
    for i in range(3):
        row_ww = [lanes(w * H_ww[i][j]) for j in range(3)]
        row_wv = [lanes(w * H_wv[i][j]) for j in range(3)]
        parts.append(jnp.stack(row_ww + row_wv))                     # H rows 0..2
    for i in range(3):
        row_vw = [lanes(w * H_wv[j][i]) for j in range(3)]           # (P W)^T
        row_vv = [lanes(w * W[i][j]) for j in range(3)]
        parts.append(jnp.stack(row_vw + row_vv))                     # H rows 3..5
    gs = [lanes(w * g_w[i]) for i in range(3)] + [lanes(w * g_v[i]) for i in range(3)]
    parts.append(jnp.stack(gs))                                      # g row
    zero = jnp.zeros((_LANES,), jnp.float32)
    parts.append(jnp.stack([lanes(w), lanes(hit), zero, zero, zero, zero]))
    out_ref[0, :, :] = jnp.concatenate(parts, axis=0)                # [48, 128]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ndt_accumulate(e, icovs, p, hit, d2, w_scale, interpret: bool = False):
    """Fused NDT normal-equation accumulation.

    e:     [K, 3] residuals (p - mean) per correspondence
    icovs: [K, 3, 3]
    p:     [K, 3] transformed points
    hit:   [K] bool
    Returns (H [6,6], g [6], sum_w scalar, n_hit scalar).
    """
    K = e.shape[0]
    # tile = 4096 measured fastest on v5e (larger tiles regressed ~2x — VMEM pressure
    # beats the saved per-step reduction overhead). Tiles below 1024 would give the
    # kernel's [tile] -> [tile/128, 128] sublane reduction fewer than 8 sublanes,
    # which Mosaic rejects ("unsupported shape cast"); correspondence counts with no
    # dividing tile >= 1024 take the identical-math XLA path instead (tiny problems —
    # the fused kernel exists for the ~100k-row production shapes).
    for tile in (4096, 2048, 1024):
        if K % tile == 0:
            break
    else:
        return ndt_accumulate_xla(e, icovs, p, hit, d2, w_scale)
    grid = K // tile

    eT = e.T.astype(jnp.float32)                       # [3, K]
    wT = icovs.reshape(K, 9).T.astype(jnp.float32)     # [9, K]
    pT = p.T.astype(jnp.float32)                       # [3, K]
    hT = hit.astype(jnp.float32).reshape(1, K)         # [1, K]

    params = jnp.stack([jnp.asarray(d2, jnp.float32), jnp.asarray(w_scale, jnp.float32)])
    out = pl.pallas_call(
        _ndt_accum_kernel,
        out_shape=jax.ShapeDtypeStruct((grid, 48, _LANES), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 48, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, eT, wT, pT, hT)

    # One cross-step + cross-lane reduce for the whole call.
    sums = jnp.sum(out, axis=(0, 2))                 # [48]
    H = sums[:36].reshape(6, 6)
    g = sums[36:42]
    return H, g, sums[42], sums[43]


def ndt_accumulate_xla(e, icovs, p, hit, d2, w_scale):
    """Reference XLA implementation (also the CPU path) — same math, unfused."""
    from lidar_graph_slam_tpu.registration.base import (
        accumulate_normal_equations,
        point_jacobian_blocks,
    )

    md2 = jnp.einsum("ki,kij,kj->k", e, icovs, e)
    w = jnp.where(hit, w_scale * jnp.exp(-0.5 * d2 * md2), 0.0)
    J = point_jacobian_blocks(p)
    H, g = accumulate_normal_equations(J, icovs, e, w)
    return H, g, jnp.sum(w), jnp.sum(hit.astype(jnp.float32))
