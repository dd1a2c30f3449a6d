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


def bundled_device_get(tree):
    """One-transfer equivalent of jax.tree.map(np.asarray, tree)."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    raw, key_impls = [], []
    for l in leaves:
        r, impl = _unwrap(jnp.asarray(l))
        raw.append(r)
        key_impls.append(impl)
    flat = np.asarray(_pack(raw))  # ONE device->host transfer
    out, off = [], 0
    for r, impl in zip(raw, key_impls):
        n = r.size * r.dtype.itemsize
        arr = np.frombuffer(
            flat[off : off + n].tobytes(), dtype=r.dtype
        ).reshape(r.shape)
        off += n
        if impl is not None:
            arr = jax.random.wrap_key_data(jnp.asarray(arr), impl=impl)
        out.append(arr)
    assert off == flat.size, (off, flat.size)
    return jax.tree.unflatten(treedef, out)
