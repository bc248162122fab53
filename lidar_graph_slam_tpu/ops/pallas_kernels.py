"""NDT/GICP normal-equation accumulation — the registration hot loop's reduction.

Fuses the per-iteration core of the Gauss-Newton inner loop — residual weights and the
6x6 normal-equation reduction over all correspondences — as pure XLA. Analytic block
structure of the point Jacobian (J = [-hat(p) | I]):

    H_ww = -P W P,  H_wv = P W,  H_vv = W,  g_w = p x (W e),  g_v = W e,   P = hat(p)

summed over correspondences with weight w = w_scale * exp(-0.5 d2 * e^T W e) * hit.

HISTORY (kernel deletion, round 5): rounds 1-4 carried a hand-written Pallas TPU kernel
for this reduction (lane-major packed inputs, per-grid-step lane-partial outputs). It
never earned its keep: the r04 roofline put it at ~2% of streaming bandwidth with an
input relayout that cost more than the kernel itself, and the round-5 END-TO-END A/B on
the real chip measured the XLA path FASTER — scan-to-submap NDT at 44.2 frames/s (XLA)
vs 38.7 frames/s (Pallas) on the same fixture in the same session (BENCH r05
`scan_match_ab.xla_accumulate_fps` vs the headline before the switch). XLA fuses this
einsum chain into the surrounding gather/transform pipeline better than the handwritten
kernel boundary allowed; the kernel was complexity without a measured win, so it was
deleted per the round-4 review's own criterion. The hot loop it serves is the
reference's `registration_->align` (`lidar_scan_matcher/src/lidar_scan_matcher.cpp:162-172`).
"""

from __future__ import annotations

import jax.numpy as jnp


def ndt_accumulate_xla(e, icovs, p, hit, d2, w_scale):
    """Weighted 6x6 normal-equation accumulation over correspondences.

    e:     [K, 3] residuals (p - mean) per correspondence
    icovs: [K, 3, 3]
    p:     [K, 3] transformed points (Jacobian anchor)
    hit:   [K] bool
    Returns (H [6,6], g [6], sum_w scalar, n_hit scalar).
    """
    from lidar_graph_slam_tpu.registration.base import (
        accumulate_normal_equations,
        point_jacobian_blocks,
    )

    md2 = jnp.einsum("ki,kij,kj->k", e, icovs, e)
    w = jnp.where(hit, w_scale * jnp.exp(-0.5 * d2 * md2), 0.0)
    J = point_jacobian_blocks(p)
    H, g = accumulate_normal_equations(J, icovs, e, w)
    return H, g, jnp.sum(w), jnp.sum(hit.astype(jnp.float32))
