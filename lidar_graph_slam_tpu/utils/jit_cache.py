"""Opt-in persistent XLA compilation cache.

The pipeline compiles ~10 distinct programs per capacity set; on the remote-compiled TPU
path that is minutes of wall clock, and the cache turns reruns into seconds. It is opt-in
(not enabled at package import) because cached CPU executables can come from a compile
machine with different CPU features than the host — XLA loads them anyway with a "could
lead to execution errors such as SIGILL" warning, and we observed silently wrong numerics
from exactly that. Only call this from accelerator entry points (bench, CLI) — never for
CPU runs (tests, the multi-chip CPU-mesh dryrun).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable the persistent compile cache if the default backend is an accelerator."""
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform == "cpu":
        return False
    path = cache_dir or os.environ.get(
        "LGS_JAX_CACHE", os.path.expanduser(f"~/.cache/lgs_jax_cache_{platform}")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
