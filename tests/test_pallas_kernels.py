"""Pallas NDT accumulation kernel vs the XLA reference implementation (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from lidar_graph_slam_tpu.ops import pallas_kernels as pk


def make_inputs(rng, K=1024):
    e = rng.normal(size=(K, 3)).astype(np.float32)
    A = rng.normal(size=(K, 3, 3)).astype(np.float32)
    icovs = A @ np.swapaxes(A, 1, 2) + 0.5 * np.eye(3, dtype=np.float32)
    p = rng.normal(size=(K, 3)).astype(np.float32) * 5.0
    hit = rng.random(K) > 0.3
    return jnp.asarray(e), jnp.asarray(icovs), jnp.asarray(p), jnp.asarray(hit)


def test_ndt_accumulate_matches_xla(rng):
    e, icovs, p, hit = make_inputs(rng)
    d2, w_scale = 0.25, 1.05
    H1, g1, sw1, nh1 = pk.ndt_accumulate(e, icovs, p, hit, d2, w_scale, interpret=True)
    H2, g2, sw2, nh2 = pk.ndt_accumulate_xla(e, icovs, p, hit, d2, w_scale)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(sw1), float(sw2), rtol=1e-4)
    assert float(nh1) == float(nh2)


def test_ndt_accumulate_all_miss(rng):
    e, icovs, p, hit = make_inputs(rng, K=256)
    hit = jnp.zeros_like(hit[:256])
    H, g, sw, nh = pk.ndt_accumulate(e[:256], icovs[:256], p[:256], hit, 0.25, 1.0,
                                     interpret=True)
    assert float(nh) == 0.0
    np.testing.assert_allclose(np.asarray(H), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_ndt_accumulate_symmetry(rng):
    e, icovs, p, hit = make_inputs(rng)
    H, g, _, _ = pk.ndt_accumulate(e, icovs, p, hit, 0.25, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, rtol=1e-4, atol=1e-3)
    # H must be PSD (it's a weighted sum of J^T W J with PSD W).
    w = np.linalg.eigvalsh(np.asarray(H))
    assert w.min() > -1e-2
