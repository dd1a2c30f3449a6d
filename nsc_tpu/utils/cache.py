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
    """TPU-only on purpose: XLA:CPU cache entries are AOT-compiled machine
    code, and in this environment compiles run on a remote helper whose CPU
    features differ from the local host — loading such an entry hangs or
    SIGILLs (observed: `cpu_aot_loader` feature-mismatch errors followed by
    a wedged executable). TPU executables are target-specific and safe."""
    import jax

    if jax.default_backend() != "tpu":
        return
    d = directory or os.environ.get("NSC_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
