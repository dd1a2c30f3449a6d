"""Residual vector quantizer (SURVEY.md §3 #6; BASELINE.json:5 "multi-codebook
nearest-neighbor search + straight-through estimator, EMA codebook updates";
distance-argmin is a declared Pallas hot path — see
nsc_tpu/ops/pallas/rvq_argmin.py for the fused kernel; this module is the
pure-XLA reference lowering the kernel must match exactly).

TPU-first design:
  * Distances computed as ||c||^2 - 2 r.c — one (M,D)x(D,K) matmul on the MXU
    per book; the ||r||^2 term is constant per row and dropped (argmin-safe).
    The formula and f32 accumulation are FIXED for bit-exact index parity
    (SURVEY.md §8 hard-part #1); ties break to the lowest index (jnp.argmin).
  * The book loop is a lax.scan over the codebook axis (static depth), so the
    whole RVQ is one fused XLA while-loop — no Python-level unrolling.
  * EMA statistics (per-book assignment counts and vector sums) are returned
    from the forward pass and folded into state by `ema_update`; under data
    parallelism they must be psum'd over the batch axis first (pass
    `axis_name` to `forward`). This keeps codebooks bit-identical across
    replicas (SURVEY.md §8 hard-part #2).
  * Depth is variable: inference slices the first n_q books (RVQ prefix
    property: indices of the first d books are independent of total depth);
    training supports per-sample random depth (quantizer dropout) for
    bandwidth scalability (BASELINE.json:11).

State pytree (all non-gradient, updated by EMA):
  {'codebooks': (n_q, K, D), 'ema_count': (n_q, K), 'ema_sum': (n_q, K, D)}
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nsc_tpu.configs import CodecConfig

RVQState = Dict[str, jax.Array]


def init_rvq(key: jax.Array, cfg: CodecConfig) -> RVQState:
    """Codebooks live in codebook_dim space; when codebook_dim != latent_dim
    the model applies trained in/out projections around the RVQ (factorized
    codes, DAC-style [INFERRED]) — see models/codec.py."""
    n_q, k, d = cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim
    cb = jax.random.normal(key, (n_q, k, d), jnp.float32)
    return {
        "codebooks": cb,
        "ema_count": jnp.zeros((n_q, k), jnp.float32),
        "ema_sum": cb.copy(),
    }


def _nearest(residual: jax.Array, codebook: jax.Array) -> jax.Array:
    """argmin_k ||r - c_k||^2 for r: (M, D), codebook: (K, D) -> (M,) int32.

    Fixed formula for cross-framework index parity: ||c||^2 - 2 r.c in f32,
    lowest index wins ties.
    """
    r = residual.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    c_sq = jnp.sum(c * c, axis=-1)  # (K,)
    # precision=HIGHEST: TPU's default matmul precision truncates f32 inputs
    # to bf16 passes, which silently broke index parity between this path and
    # the (true-f32) Pallas kernel on-chip (caught by bench_suite config 6 —
    # interpret-mode CPU tests can't see it). The f32 contract is explicit.
    scores = c_sq[None, :] - 2.0 * jnp.dot(
        r, c.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (M, K)
    return jnp.argmin(scores, axis=-1).astype(jnp.int32)


class RVQForward(NamedTuple):
    quantized: jax.Array        # (..., D) — STE-passthrough quantized latents
    indices: jax.Array          # (..., n_q) int32 codebook indices
    commit_loss: jax.Array      # scalar commitment loss
    counts: jax.Array           # (n_q, K) assignment counts (for EMA)
    sums: jax.Array             # (n_q, K, D) assigned-vector sums (for EMA)
    usage: jax.Array            # (n_q,) fraction of codes used this batch


def quantize(
    state: RVQState, z: jax.Array, n_q: Optional[int] = None,
    *, backend: str = "xla",
) -> jax.Array:
    """Encode latents to indices. z: (..., D) -> (..., n_q) int32.

    backend 'pallas' uses the fused VMEM-resident kernel
    (ops/pallas/rvq_argmin.py) — index-bit-exact with the XLA path; falls
    back automatically when TPU tiling constraints aren't met."""
    books = state["codebooks"] if n_q is None else state["codebooks"][:n_q]
    lead = z.shape[:-1]
    r = z.reshape(-1, z.shape[-1]).astype(jnp.float32)

    if backend == "pallas" and jax.default_backend() == "tpu":
        from nsc_tpu.ops.pallas import rvq_argmin as PK

        if PK.pallas_supported(*books.shape):
            idx = PK.quantize_pallas(books, r)
            return idx.reshape(*lead, books.shape[0])

    def step(residual, cb):
        idx = _nearest(residual, cb)
        return residual - cb[idx], idx

    _, idxs = lax.scan(step, r, books)  # idxs: (n_q, M)
    return jnp.moveaxis(idxs, 0, -1).reshape(*lead, books.shape[0])


def dequantize(
    state: RVQState, indices: jax.Array, n_q: Optional[int] = None,
    *, backend: str = "xla",
) -> jax.Array:
    """Decode indices to latents. indices: (..., n_q_in) -> (..., D).

    If n_q is given, only the first n_q books are summed (bitrate truncation,
    BASELINE.json:11)."""
    used = indices.shape[-1] if n_q is None else n_q
    books = state["codebooks"][:used]  # (n_q, K, D)

    if backend == "pallas" and jax.default_backend() == "tpu":
        from nsc_tpu.ops.pallas import rvq_argmin as PK

        if PK.pallas_supported(*books.shape):
            lead = indices.shape[:-1]
            idx2d = indices[..., :used].reshape(-1, used)
            out = PK.dequantize_pallas(books, idx2d)
            return out.reshape(*lead, books.shape[-1])

    idx = jnp.moveaxis(indices[..., :used], -1, 0)  # (n_q, ...)

    def step(acc, book_and_idx):
        cb, i = book_and_idx
        return acc + cb[i], None

    lead = idx.shape[1:]
    acc0 = jnp.zeros((*lead, books.shape[-1]), jnp.float32)
    out, _ = lax.scan(step, acc0, (books, idx))
    return out


def argmin_margins(
    state: RVQState, z: jax.Array, n_q: Optional[int] = None
) -> jax.Array:
    """Per-stage argmin SAFETY MARGINS: top2 − top1 of the f32 distance
    scores at every residual step. z: (..., D) -> (..., n_q) f32 margins.

    Diagnostic for the canonical-pin contract (nsc_tpu/canonical.py,
    VERDICT r4 weak #4): cross-lowering index agreement erodes as trained
    codebooks densify (99.85% at random init → 91.6% after the r4 refit)
    because bf16-path reorderings flip indices whose top1/top2 distances are
    nearly tied. The margin distribution on a probe batch is the predictive
    indicator — if the low percentiles shrink toward the f32 rounding noise
    of the score computation (~1e-6 · ‖c‖²-scale), pin reproduction is one
    compiler/runtime bump from flaking and bench output should show it
    BEFORE it flakes. Uses the exact `_nearest` score contract
    (‖c‖² − 2r·c in f32, precision=HIGHEST); margins are invariant to the
    dropped ‖r‖² term. The residual chain follows the top1 assignment, so
    stage q's margin is conditioned on the canonical stage<q path."""
    books = state["codebooks"] if n_q is None else state["codebooks"][:n_q]
    lead = z.shape[:-1]
    r0 = z.reshape(-1, z.shape[-1]).astype(jnp.float32)

    def step(residual, cb):
        c = cb.astype(jnp.float32)
        c_sq = jnp.sum(c * c, axis=-1)
        scores = c_sq[None, :] - 2.0 * jnp.dot(
            residual, c.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )  # (M, K)
        top2, _ = lax.top_k(-scores, 2)  # negated: top2[:,0] = min score
        margin = -top2[:, 1] + top2[:, 0]  # second_smallest - smallest >= 0
        idx = jnp.argmin(scores, axis=-1).astype(jnp.int32)
        return residual - c[idx], margin

    _, margins = lax.scan(step, r0, books)  # (n_q, M)
    return jnp.moveaxis(margins, 0, -1).reshape(*lead, books.shape[0])


def forward(
    state: RVQState,
    z: jax.Array,
    *,
    n_q: Optional[int] = None,
    depth: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> RVQForward:
    """Training/inference forward: quantize with STE and collect EMA stats.

    z: (N, T, D). `depth`: optional (N,) int array of per-sample active book
    counts (quantizer dropout); books q >= depth[i] are excluded from the
    output sum and from EMA stats for sample i, but the residual chain is the
    full-depth chain, preserving the RVQ prefix property (indices of active
    books match what a shallower encode would produce).
    """
    cfg_books = state["codebooks"] if n_q is None else state["codebooks"][:n_q]
    num_books, k, d = cfg_books.shape
    n, t, _ = z.shape
    m = n * t
    zf = z.reshape(m, d).astype(jnp.float32)

    if depth is None:
        sample_mask = jnp.ones((num_books, m), jnp.float32)
    else:
        q_ids = jnp.arange(num_books)[:, None]  # (n_q, 1)
        per_sample = (q_ids < depth[None, :]).astype(jnp.float32)  # (n_q, N)
        sample_mask = jnp.repeat(per_sample, t, axis=1)  # (n_q, N*T)

    def step(carry, xs):
        residual, acc = carry
        cb, mask = xs  # cb: (K, D), mask: (M,)
        idx = _nearest(residual, cb)
        quant = cb[idx]  # (M, D)
        onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32) * mask[:, None]
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = jnp.dot(
            onehot.T, residual, preferred_element_type=jnp.float32
        )  # (K, D)
        acc = acc + quant * mask[:, None]
        residual = residual - quant  # full chain (prefix property)
        usage = jnp.mean((counts > 0).astype(jnp.float32))
        return (residual, acc), (idx, counts, sums, usage)

    (_, acc), (idxs, counts, sums, usage) = lax.scan(
        step, (zf, jnp.zeros_like(zf)), (cfg_books, sample_mask)
    )

    if axis_name is not None:
        counts = lax.psum(counts, axis_name)
        sums = lax.psum(sums, axis_name)

    zq = acc.reshape(n, t, d)
    # commitment loss: pull encoder output toward its (masked) quantization
    commit = jnp.mean(jnp.square(z.astype(jnp.float32) - lax.stop_gradient(zq)))
    # straight-through: gradients flow to z, values come from zq
    zq_ste = z + lax.stop_gradient(zq - z.astype(jnp.float32)).astype(z.dtype)

    indices = jnp.moveaxis(idxs, 0, -1).reshape(n, t, num_books)
    return RVQForward(zq_ste, indices, commit, counts, sums, usage)


def init_codebooks_from_data(
    key: jax.Array,
    state: RVQState,
    z: jax.Array,
    *,
    kmeans_iters: int = 2,
) -> RVQState:
    """Data-driven codebook init (VERDICT r3 #4; EnCodec/DAC-family practice
    [INFERRED]): book q is initialized from the RESIDUAL pool left after
    books < q, instead of N(0,1) noise whose scale has nothing to do with the
    encoder's latents. With random init, most codes never win a single
    assignment and the EMA can only revive them through reseeding — the r3
    flagship run equilibrated at ~14% usage. Seeding every code at an actual
    data point (then a few Lloyd iterations to spread them) starts every code
    inside the distribution it must tile.

    z: (..., D) pre-quantization latents (model.encode's projected latents
    for factorized configs). Sampling is WITHOUT replacement (a permutation
    of the pool, so seed points are distinct; it wraps — introducing
    duplicates — only when K exceeds the pool size). The `key` must be
    replicated, so the function is safe to run under one device (the
    intended use: once, eagerly, at step 0 — see train/loop.py)."""
    books = state["codebooks"]
    n_q, k, d = books.shape
    pool = z.reshape(-1, d).astype(jnp.float32)
    m = pool.shape[0]

    def one_book(carry, bk):
        residual, key = carry
        key, k_pick = jax.random.split(key)
        # sample K starting points from the residual pool (permutation when
        # the pool is big enough => distinct; wraps otherwise)
        pick = jax.random.permutation(k_pick, m)[
            jnp.arange(k) % jnp.maximum(m, 1)
        ]
        cb = residual[pick]

        def lloyd(_, cb):
            idx = _nearest(residual, cb)
            onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)  # (K,)
            sums = jnp.dot(
                onehot.T, residual, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            # empty clusters keep their current point
            return jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cb
            )

        cb = lax.fori_loop(0, kmeans_iters, lloyd, cb)
        idx = _nearest(residual, cb)
        return (residual - cb[idx], key), cb

    (_, _), new_books = lax.scan(
        one_book, (pool, key), jnp.arange(n_q)
    )
    # EMA stats consistent with the new codebooks: a uniform-ish count well
    # above the dead threshold gives every code a fair grace window
    count0 = jnp.full((n_q, k), jnp.maximum(m / k, 8.0), jnp.float32)
    return {
        "codebooks": new_books,
        "ema_count": count0,
        "ema_sum": new_books * count0[..., None],
    }


def sample_reseed_candidates(
    key: jax.Array,
    pool: jax.Array,
    n_q: int,
    k: int,
    *,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Pick (n_q, K) random vectors from the (global) encoder-output pool for
    dead-code reseeding.

    Under DP, `pool` is the per-replica shard and `key` MUST be replicated:
    a global index is drawn and the owning replica's vector is psum-broadcast,
    so every replica reseeds identically (invariant-by-construction — this is
    what keeps codebooks bit-identical across the mesh; cheaper than
    all_gathering the whole pool, and provably replicated under shard_map's
    varying-axis check, which all_gather is not)."""
    m = pool.shape[0]
    if axis_name is None:
        pick = jax.random.randint(key, (n_q, k), 0, m)
        return pool[pick]
    ndev = lax.axis_size(axis_name)
    gpick = jax.random.randint(key, (n_q, k), 0, m * ndev)  # replicated
    my = lax.axis_index(axis_name)
    local_idx = gpick - my * m
    in_range = (local_idx >= 0) & (local_idx < m)
    safe = jnp.clip(local_idx, 0, m - 1)
    cand = pool[safe] * in_range[..., None].astype(pool.dtype)
    return lax.psum(cand, axis_name)


def ema_update(
    state: RVQState,
    counts: jax.Array,
    sums: jax.Array,
    *,
    decay: float = 0.99,
    eps: float = 1e-5,
    dead_threshold: float = 2.0,
    reseed_candidates: Optional[jax.Array] = None,
    return_metrics: bool = False,
):
    """Fold one batch's assignment stats into the EMA codebooks.

    Standard VQ-VAE EMA with Laplace smoothing; codes whose EMA usage falls
    below `dead_threshold` are reseeded from `reseed_candidates` — a
    (n_q, K, D) array of encoder outputs (see sample_reseed_candidates) — to
    prevent codebook collapse. Under DP, `counts`/`sums` must already be
    psum'd (forward(axis_name=...)).

    Reseeded codes get their EMA count reset to dead_threshold / decay**grace
    (grace = 20 steps): a reseeded code that wins no assignments for ~grace
    steps dies again, but it is not re-reseeded on the very next step the way
    a reset-to-1 (< threshold) would force — that caused indefinite churn at
    small batch sizes.

    With return_metrics=True returns (state, {'reseed_frac': scalar}).
    """
    n_q_used = counts.shape[0]
    cb_all = state["codebooks"]
    ema_count = state["ema_count"]
    ema_sum = state["ema_sum"]

    new_count = decay * ema_count[:n_q_used] + (1.0 - decay) * counts
    new_sum = decay * ema_sum[:n_q_used] + (1.0 - decay) * sums

    total = jnp.sum(new_count, axis=-1, keepdims=True)  # (n_q, 1)
    k = new_count.shape[-1]
    smoothed = (new_count + eps) / (total + k * eps) * total
    new_cb = new_sum / smoothed[..., None]

    reseed_frac = jnp.zeros((), jnp.float32)
    if reseed_candidates is not None:
        candidates = reseed_candidates  # (n_q, K, D)
        dead = (new_count < dead_threshold)[..., None]
        reseed_frac = jnp.mean(dead.astype(jnp.float32))
        # ~20 steps of decay-grace at the default 0.99; capped so small test
        # decays don't blow the count (and with it the EMA inertia) up
        grace_count = min(dead_threshold / decay**20, 4.0 * dead_threshold)
        new_cb = jnp.where(dead, candidates, new_cb)
        # reset EMA stats of reseeded codes so they don't instantly re-die
        new_sum = jnp.where(dead, candidates * grace_count, new_sum)
        new_count = jnp.where(
            dead[..., 0], jnp.full_like(new_count, grace_count), new_count
        )

    out = {
        "codebooks": cb_all.at[:n_q_used].set(new_cb),
        "ema_count": ema_count.at[:n_q_used].set(new_count),
        "ema_sum": ema_sum.at[:n_q_used].set(new_sum),
    }
    if return_metrics:
        return out, {"reseed_frac": reseed_frac}
    return out


def codebook_perplexity(counts: jax.Array) -> jax.Array:
    """exp(entropy) of the batch assignment distribution, per book — the
    dead-code / collapse observability metric (SURVEY.md §6 metrics row)."""
    p = counts / jnp.maximum(jnp.sum(counts, axis=-1, keepdims=True), 1e-9)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)
    return jnp.exp(ent)
