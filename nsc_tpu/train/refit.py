"""Post-training codebook refit (VERDICT r3 #4; BASELINE.json:11 bandwidth
axis).

The r3 flagship run equilibrated at ~14% codebook usage: EMA dynamics under
a narrow synthetic distribution leave most codes dead, so the 16 nominal
bitrates of the depth sweep carry far lower *effective* rates. Retraining is
hours on this rig; this module instead re-estimates the codebooks OFFLINE
against the trained encoder's latent distribution, with encoder/decoder
frozen:

  1. collect a large pool of pre-quantization latents (model.latents — the
     projected codebook-space distribution for factorized configs) from the
     checkpoint's own training data spec;
  2. sequential residual k-means: book q is fit (seeded at data points, then
     Lloyd iterations) on the residual pool left by refit books < q — the
     same procedure as step-0 data init (ops/rvq.py::init_codebooks_from_data),
     just on the *trained* encoder's latents with more data and iterations.

Every code ends at the mean of a real data cluster, so usage rises by
construction; the decoder is unchanged but receives a strictly better
approximation of the latent it was trained to invert (quantizer dropout
trained it across noise levels), so reconstruction quality should improve or
hold at every depth — measured, not assumed: scripts/refit_flagship.py runs
the before/after bitrate sweep and only exports on improvement.

Device-first: the latent pool stays on device end-to-end (relay d2h runs at
~1-2 MB/s — pulling a 64 MB pool would cost minutes; the stats pulled back
are KB-sized).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.ops import rvq as rvq_ops


def collect_latents(bundle, batches: Iterator[np.ndarray], n_batches: int) -> jax.Array:
    """Run `n_batches` waveform batches through the trained encoder and
    return the pooled pre-quantization latents, (M, D) f32, ON DEVICE."""
    lat_fn = jax.jit(lambda p, w: bundle.model.latents(p, w))
    parts = []
    for _ in range(n_batches):
        z = lat_fn(bundle.params, jnp.asarray(next(batches)))
        parts.append(z.reshape(-1, z.shape[-1]).astype(jnp.float32))
    return jnp.concatenate(parts, axis=0)


def refit_codebooks(
    key: jax.Array,
    rvq_state: rvq_ops.RVQState,
    pool: jax.Array,
    *,
    kmeans_iters: int = 10,
) -> rvq_ops.RVQState:
    """Sequential residual k-means over all books; returns a full RVQState
    (EMA stats reset consistently with the new codebooks)."""
    fn = jax.jit(
        functools.partial(
            rvq_ops.init_codebooks_from_data, kmeans_iters=kmeans_iters
        )
    )
    return fn(key, rvq_state, pool)


@jax.jit
def _pool_stats(rvq_state: rvq_ops.RVQState, pool: jax.Array):
    """Per-book assignment counts (n_q, K) and cumulative-depth residual MSE
    (n_q,) of quantizing `pool` — the utilization/accuracy diagnostics, all
    device-side (only KBs come back)."""
    books = rvq_state["codebooks"]
    k = books.shape[1]

    def step(residual, cb):
        idx = rvq_ops._nearest(residual, cb)
        nxt = residual - cb[idx]
        counts = jnp.sum(jax.nn.one_hot(idx, k, dtype=jnp.float32), axis=0)
        return nxt, (counts, jnp.mean(jnp.square(nxt)))

    _, (counts, mse) = jax.lax.scan(step, pool.astype(jnp.float32), books)
    return counts, mse


def pool_report(rvq_state: rvq_ops.RVQState, pool: jax.Array) -> Dict:
    """Host-side summary dict: per-book usage / perplexity and per-depth
    residual MSE on `pool`."""
    counts, mse = _pool_stats(rvq_state, pool)
    counts = np.asarray(counts, np.float64)
    p = counts / np.maximum(counts.sum(axis=-1, keepdims=True), 1.0)
    ent = -(p * np.log(np.where(p > 0, p, 1.0))).sum(axis=-1)
    return {
        "book_usage": [round(float(u), 4) for u in (counts > 0).mean(axis=-1)],
        "book_perplexity": [round(float(x), 1) for x in np.exp(ent)],
        "mean_usage": round(float((counts > 0).mean()), 4),
        "residual_mse_per_depth": [
            round(float(x), 6) for x in np.asarray(mse)
        ],
    }
