"""Pallas TPU kernel: fused RVQ distance-argmin (BASELINE.json:5 names "RVQ
distance argmin" as a mandated fused hot path; SURVEY.md §3 #6).

Why a kernel: the XLA lowering of the RVQ book loop materializes a
(M, K) f32 score matrix in HBM per codebook (131 MB/book at the bench shape)
plus the residual round-trips. This kernel keeps everything in VMEM:

  grid over M tiles; per tile:
    r <- z tile                                  (VMEM)
    for q in books:                              (sequential: residual dep)
      scores = ||c||^2 - 2 r @ cbT[q]            (MXU, f32)
      idx    = argmin(scores)                    (VPU; lowest index on ties)
      quant  = onehot(idx) @ cb[q]               (MXU gather — no HBM gather)
      r     -= quant
  HBM traffic: read z once, codebooks once (resident), write (M, n_q) int32.

EXACTNESS CONTRACT: same fixed distance formula, f32 accumulation and
tie-break as nsc_tpu.ops.rvq._nearest — verified index-bit-exact in
tests/unit/test_pallas_rvq.py. Falls back to the XLA path when shapes don't
meet TPU tiling constraints (codebooks must fit VMEM, K % 128 == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512
_VMEM_BUDGET = 10 * 1024 * 1024  # codebook residency budget (bytes)


def pallas_supported(n_q: int, k: int, d: int) -> bool:
    d_pad = _round_up(d, 128)
    return (
        k % 128 == 0
        and k >= 128
        and n_q * k * d_pad * 4 <= _VMEM_BUDGET
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quantize_kernel(z_ref, cbt_ref, csq_ref, idx_ref, *, n_q: int):
    r = z_ref[:].astype(jnp.float32)  # (TM, D)
    k = cbt_ref.shape[-1]

    def nearest(q, r):
        # scores = ||c||^2 - 2 r.c  — (TM, K) entirely in VMEM
        # precision=HIGHEST: Mosaic lowers f32 dots at DEFAULT (bf16-pass)
        # precision otherwise — measured 0.13 max abs drift vs true f32 at
        # these shapes, which broke on-chip index parity (bench_suite #6)
        scores = csq_ref[pl.ds(q, 1), :] - 2.0 * jax.lax.dot_general(
            r, cbt_ref[q],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        idx = jnp.argmin(scores, axis=-1).astype(jnp.int32)  # lowest-index ties
        idx_ref[:, pl.ds(q, 1)] = idx[:, None]
        return idx, scores

    def body(q, r):
        idx, scores = nearest(q, r)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            == idx[:, None]
        ).astype(jnp.float32)
        # quant = onehot @ cb[q]; cb[q] == cbt[q].T, contract K with K
        quant = jax.lax.dot_general(
            onehot, cbt_ref[q],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact f32 codeword gather
        )
        return r - quant

    # the LAST book's residual update is dead work (nothing consumes r after
    # it) — 2 of the 2*n_q HIGHEST-precision matmuls skipped
    r = jax.lax.fori_loop(0, n_q - 1, body, r, unroll=True)
    nearest(n_q - 1, r)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_pallas(
    codebooks: jax.Array, z2d: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """codebooks (n_q, K, D) f32, z2d (M, D) -> (M, n_q) int32.

    Semantically identical to scanning ops.rvq._nearest over the books."""
    n_q, k, d = codebooks.shape
    m = z2d.shape[0]
    d_pad = _round_up(d, 128)
    m_pad = _round_up(m, TILE_M)

    cb = codebooks.astype(jnp.float32)
    if d_pad != d:  # zero-pad feature dim: distances unchanged
        cb = jnp.pad(cb, ((0, 0), (0, 0), (0, d_pad - d)))
        z2d = jnp.pad(z2d, ((0, 0), (0, d_pad - d)))
    if m_pad != m:
        z2d = jnp.pad(z2d, ((0, m_pad - m), (0, 0)))
    cbt = jnp.transpose(cb, (0, 2, 1))  # (n_q, D, K)
    csq = jnp.sum(cb * cb, axis=-1)  # (n_q, K)

    out = pl.pallas_call(
        functools.partial(_quantize_kernel, n_q=n_q),
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, d_pad, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, n_q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_q), jnp.int32),
        interpret=interpret,
    )(z2d.astype(jnp.float32), cbt, csq)
    return out[:m]


def _dequantize_kernel(idx_ref, cbt_ref, out_ref, *, n_q: int):
    k = cbt_ref.shape[-1]
    tm = idx_ref.shape[0]

    def body(q, acc):
        idx = idx_ref[:, pl.ds(q, 1)]  # (TM, 1)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (tm, k), 1) == idx
        ).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, cbt_ref[q],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact f32 codeword gather
        )

    out_ref[:] = jax.lax.fori_loop(
        0, n_q, body, jnp.zeros(out_ref.shape, jnp.float32), unroll=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequantize_pallas(
    codebooks: jax.Array, idx2d: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """codebooks (n_q, K, D) f32 (first n_q books = idx2d's books),
    idx2d (M, n_q) int32 -> (M, D) f32 sum of codewords."""
    n_q, k, d = codebooks.shape
    assert idx2d.shape[1] == n_q
    m = idx2d.shape[0]
    d_pad = _round_up(d, 128)
    m_pad = _round_up(m, TILE_M)

    cb = codebooks.astype(jnp.float32)
    if d_pad != d:
        cb = jnp.pad(cb, ((0, 0), (0, 0), (0, d_pad - d)))
    if m_pad != m:
        idx2d = jnp.pad(idx2d, ((0, m_pad - m), (0, 0)))
    cbt = jnp.transpose(cb, (0, 2, 1))

    out = pl.pallas_call(
        functools.partial(_dequantize_kernel, n_q=n_q),
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, n_q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, d_pad, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(idx2d, cbt)
    return out[:m, :d]
