"""Persistent XLA compilation cache.

Remote TPU compiles in this environment are expensive (tens of seconds to
minutes per program); enabling JAX's persistent cache makes every entry
point (CLI, bench, graft hooks) reuse compiled executables across processes.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VIL_TPU_COMPILE_CACHE", "/tmp/vil_tpu_jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is best-effort
        pass
