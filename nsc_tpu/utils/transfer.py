"""Bundled device->host transfer.

`np.asarray` / `jax.device_get` over a big pytree pulls one buffer per leaf;
on this environment's tunneled TPU each pull pays a relay round-trip.
`bundled_device_get` bitcasts every leaf to bytes ON DEVICE, concatenates
into a single uint8 vector, pulls that once, and rebuilds the tree
host-side — removing the per-leaf round-trips (hundreds for a train state).
Measured caveat (30k demo run): the relay's BULK d2h bandwidth is ~1-2 MB/s,
so large states remain slow to pull there regardless of leaf count; on a
directly-attached TPU the single-DMA form is strictly better.

Handles any dtype (via bitcast) including typed PRNG key arrays (unwrapped
with jax.random.key_data and re-wrapped on the host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unwrap(leaf):
    """typed PRNG key arrays -> (raw uint32 data, impl name)."""
    if jnp.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
        return jax.random.key_data(leaf), jax.random.key_impl(leaf)
    return leaf, None


@jax.jit
def _pack(leaves):
    chunks = []
    for l in leaves:
        if l.dtype == jnp.bool_:
            l = l.astype(jnp.uint8)
        if l.dtype != jnp.uint8:
            l = jax.lax.bitcast_convert_type(l, jnp.uint8)
        chunks.append(l.ravel())
    return jnp.concatenate(chunks) if chunks else jnp.zeros((0,), jnp.uint8)


class DeviceSnapshot:
    """Device-side snapshot of a pytree: the packed flat uint8 buffer plus
    rebuild metadata. Taking one is a single async device program (a copy —
    the flat buffer is a FRESH output, so the source tree may be donated to
    the next train step immediately). `materialize()` does the slow d2h pull
    + rebuild; call it on a writer thread to overlap host I/O with compute
    (async checkpointing, SURVEY.md §6)."""

    def __init__(self, flat, specs, key_impls, treedef):
        self._flat = flat
        self._specs = specs  # ShapeDtypeStructs of the raw (unwrapped) leaves
        self._key_impls = key_impls
        self._treedef = treedef

    def materialize(self, chunk_bytes: int = 8 << 20):
        """Pull + rebuild. The pull is CHUNKED (default 8 MB slices): on a
        relay-tunneled TPU a single bulk transfer serializes the connection
        for minutes, starving concurrent train-step dispatches (measured:
        0.24 steps/s during a 429 MB pull vs 4.2 nominal). Chunking bounds
        each exclusive occupancy to ~chunk/bandwidth so the training thread
        interleaves; total pull time is unchanged (bandwidth-bound)."""
        n = int(self._flat.size)
        if n <= chunk_bytes:
            flat = np.asarray(self._flat)  # one device->host transfer
        else:
            flat = np.empty((n,), np.uint8)
            for a in range(0, n, chunk_bytes):
                b = min(a + chunk_bytes, n)
                flat[a:b] = np.asarray(self._flat[a:b])
        out, off = [], 0
        for spec, impl in zip(self._specs, self._key_impls):
            n = spec.size * spec.dtype.itemsize
            arr = np.frombuffer(
                flat[off : off + n].tobytes(), dtype=spec.dtype
            ).reshape(spec.shape)
            off += n
            if impl is not None:
                arr = jax.random.wrap_key_data(jnp.asarray(arr), impl=impl)
            out.append(arr)
        assert off == flat.size, (off, flat.size)
        return jax.tree.unflatten(self._treedef, out)


def bundled_snapshot(tree) -> DeviceSnapshot:
    """Snapshot `tree` into one flat device buffer (see DeviceSnapshot)."""
    leaves, treedef = jax.tree.flatten(tree)
    raw, key_impls = [], []
    for l in leaves:
        r, impl = _unwrap(jnp.asarray(l))
        raw.append(r)
        key_impls.append(impl)
    flat = _pack(raw) if raw else jnp.zeros((0,), jnp.uint8)
    # 1-element readback = relay-safe completion barrier (block_until_ready
    # is a no-op through the relay): guarantees the pack has executed on
    # the dispatching thread before the buffer is handed to a writer
    # thread. Costs one tiny RPC.
    if flat.size:
        np.asarray(flat[:1])
    specs = [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in raw]
    return DeviceSnapshot(flat, specs, key_impls, treedef)


def bundled_device_get(tree):
    """One-transfer equivalent of jax.tree.map(np.asarray, tree)."""
    if not jax.tree.leaves(tree):
        return tree
    return bundled_snapshot(tree).materialize()
