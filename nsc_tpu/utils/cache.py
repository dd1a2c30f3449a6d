"""Persistent XLA compilation cache (SURVEY.md §6 tracing/observability row).

Compiles in this environment go through a remote-compile relay at ~10 s per
unique op graph (~6 min for the full codec), so caching compiled executables
across processes matters: bench, train and the driver's entry checks all hit
the same graphs.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nsc_tpu_xla")


def enable_compilation_cache(directory: str | None = None) -> None:
    import jax

    d = directory or os.environ.get("NSC_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
