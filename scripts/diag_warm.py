"""Diagnostic: per-iteration LM behavior at cold vs warm start (bench_pose_graph graphs).

Instrumented rerun of `graph/solver.py:optimize`'s body outside the while_loop so each
iteration's step norm / cost delta / predicted decrease is visible. CPU-only tooling.
"""
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from lidar_graph_slam_tpu.core import se3
from lidar_graph_slam_tpu.graph import solver


def build_graph(K, L, rng):
    g = solver.init_graph(K, L, (1e-6,) * 3 + (1e-8, 1e-8, 1e-6))
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
            jnp.asarray(min(512, K - lo), jnp.int32))
    for l in range(L):
        i = (l * K // L) % K
        j = (i + K // 2) % K
        Zl = np.asarray(se3.inverse(jnp.asarray(g.poses[i])) @ jnp.asarray(g.poses[j]))
        g = solver.graph_add_loop(g, jnp.asarray(i), jnp.asarray(j), jnp.asarray(Zl),
                                  jnp.full((6,), 1e2, jnp.float32))
    return g


def trace_lm(g, poses, n_iter=15, damping=1e-4):
    poses = jnp.asarray(poses)
    damping = jnp.asarray(damping, jnp.float32)
    cost0 = solver.graph_cost(g, poses)
    rows = []
    for it in range(n_iter):
        delta = solver._solve_step(g, poses, damping)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        cand = poses @ se3.se3_exp(delta)
        cand_cost = solver.graph_cost(g, cand)
        accept = bool(cand_cost < cost0)
        step_norm = float(jnp.max(jnp.linalg.norm(delta, axis=-1)))
        rel = float(abs(cand_cost - cost0) / max(float(cost0), 1e-3))
        rows.append((it, accept, step_norm, float(cost0), float(cand_cost), rel,
                     float(damping)))
        if accept:
            poses, cost0 = cand, cand_cost
            damping = damping * 0.3
        else:
            damping = damping * 8.0
        damping = jnp.clip(damping, 1e-9, 1e6)
    return rows


for K, L in ((1024, 8), (4096, 64)):
    rng = np.random.default_rng(0)
    g = build_graph(K, L, rng)
    print(f"=== K={K} L={L} COLD ===")
    for r in trace_lm(g, g.poses, 15):
        print(f"it={r[0]:2d} acc={int(r[1])} step={r[2]:.3e} cost={r[3]:.6e}->{r[4]:.6e} rel={r[5]:.2e} damp={r[6]:.1e}")
    g_warm = g
    for _ in range(4):
        g_warm = solver.optimize(g_warm, max_iterations=50)
    print(f"=== K={K} L={L} WARM ===")
    for r in trace_lm(g_warm, g_warm.poses, 15):
        print(f"it={r[0]:2d} acc={int(r[1])} step={r[2]:.3e} cost={r[3]:.6e}->{r[4]:.6e} rel={r[5]:.2e} damp={r[6]:.1e}")
