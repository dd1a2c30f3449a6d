"""Data-parallel training over a TPU mesh (SURVEY.md §3 #17, §6 "Distributed
communication backend").

The contract (BASELINE.json:5): "Training ... runs data-parallel across a TPU
slice with batched-waveform sharding over ICI". The TPU-native realization —
replacing the reference's NCCL DDP [INFERRED] — is:

  * one mesh axis 'data' over all devices (jax.make_mesh handles multi-host
    slices: ICI within a slice, DCN across — same code),
  * batches sharded on 'data' via NamedSharding, params/state replicated,
  * the train step wrapped in shard_map; gradient sync is lax.pmean (XLA
    all-reduce riding ICI), RVQ EMA stats lax.psum, reseed pool
    lax.all_gather — all emitted by the step itself (nsc_tpu/train/train.py).

No hand-written comms layer exists or is needed: XLA's collectives ARE the
backend. Multi-host entry is jax.distributed.initialize() in the runner.

TP/PP/EP are N/A for this model family (no attention; model fits per chip —
SURVEY.md §3 #17); long-sequence scaling is streaming chunked encode
(nsc_tpu/streaming.py), the codec analog of context parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host (N, T) batch sharded over the data axis.

    Multi-host: each process passes its process-local batch slice (global
    batch = local batch * num_processes) and jax assembles the global array;
    single-host this is just a sharded device_put."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_parallel_infer(model, mesh: Mesh, *, kind: str = "reconstruct"):
    """DP inference over the mesh — the BASELINE.json:5 north-star shape
    (batched encode+decode across a v5e-8). Inference has no cross-replica
    state, so plain jit with shardings suffices: XLA partitions the batch
    axis, params replicate, no collectives are emitted (embarrassingly
    parallel => linear RTF scaling).

    kind: 'reconstruct' (N,T)->(N,T) | 'encode' (N,T)->(N,F,n_q) |
          'decode' (N,F,n_q)->(N,T). Batch N must divide the mesh size.
    Returns fn(params, rvq, x, n_q=None)."""
    import functools

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(DATA_AXIS))
    method = {
        "reconstruct": model.reconstruct,
        "encode": model.encode,
        "decode": model.decode,
    }[kind]

    @functools.partial(
        jax.jit,
        static_argnames=("n_q",),
        in_shardings=(rep, rep, shd),
        out_shardings=shd,
    )
    def run(params, rvq, x, n_q=None):
        return method(params, rvq, x, n_q=n_q)

    return run


def make_parallel_train_step(model, tcfg, mesh: Mesh):
    """shard_map-wrapped, jitted train step: batch sharded on 'data', state
    replicated. Collectives inside the step keep every replica's state
    identical, so out_specs are unsharded."""
    from nsc_tpu.train.train import make_train_step

    step = make_train_step(model, tcfg, axis_name=DATA_AXIS)
    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),  # state replicated, batch sharded
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))
