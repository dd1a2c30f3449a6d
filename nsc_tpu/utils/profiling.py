"""Tracing / profiling utilities (SURVEY.md §6 tracing row).

The reference-family tooling is torch.profiler [INFERRED]; the TPU-native
equivalents here:
  * `trace(dir)` — context manager around jax.profiler.trace; view with
    tensorboard's profile plugin.
  * `timed(name)` — wall-clock block timing with a device-completion barrier
    that works through this environment's remote-execution relay (a host
    readback of a scalar; jax.block_until_ready returns early here — see
    bench.py).
  * `Stopwatch` — accumulating named timers for loop instrumentation;
    `report()` emits a JSONL-able dict.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax
import jax.numpy as jnp


def barrier(x=None) -> None:
    """Reliable device-completion barrier: forces a tiny host readback.
    Under the axon relay, jax.block_until_ready() returns before execution
    finishes; reading a value cannot."""
    if x is None:
        x = jnp.zeros(())
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(jnp.abs(jnp.ravel(leaves[0])[:1].astype(jnp.float32))))


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA-level profiler trace; open with tensorboard --logdir=<dir>."""
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed(name: str, results: Dict[str, float] | None = None) -> Iterator[None]:
    barrier()
    start = time.perf_counter()
    yield
    barrier()
    dt = time.perf_counter() - start
    if results is not None:
        results[name] = dt
    else:
        print(f"[timed] {name}: {dt*1000:.2f} ms")


class Stopwatch:
    def __init__(self):
        self._acc = defaultdict(float)
        self._n = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        start = time.perf_counter()
        yield
        self._acc[name] += time.perf_counter() - start
        self._n[name] += 1

    def report(self) -> Dict[str, float]:
        return {
            f"time/{k}_ms": 1000 * v / max(self._n[k], 1)
            for k, v in self._acc.items()
        }
