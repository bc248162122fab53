"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (every package's BUILD_TESTING block is lint-only —
SURVEY.md §4); this suite is the framework's from scratch. Multi-chip collective paths are
exercised without a pod by forcing 8 virtual CPU devices, the "fake backend" strategy from
SURVEY.md §4.

Note: the environment's sitecustomize pre-imports jax and pins the platform config, so the
usual JAX_PLATFORMS env var is ineffective here; we override via jax.config instead, before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
