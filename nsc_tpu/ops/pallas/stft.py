"""Pallas TPU kernel: fused framed-STFT magnitude (BASELINE.json:5 names
"framed STFT" as a mandated fused hot path; SURVEY.md §3 #2).

The XLA matmul-DFT path (ops/stft.py) materializes the framed signal
(B, frames, n_fft) in HBM — an n_fft/hop x duplication of the input (4x for
the loss configs) round-tripped per resolution. This kernel DMAs each
overlapping segment HBM->VMEM once, windows it, applies the real/imag DFT
bases on the MXU, and writes only |STFT|:

  HBM traffic: read x ~(1 + overlap) times + bases once per K-tile,
  write magnitudes once. No framed intermediate.

Grid: (batch, frame-tiles, K-tiles). Frame tiles overlap by n_fft - hop, so
the signal stays ungridded (memory_space ANY) and the kernel issues a manual
async copy per tile — the canonical Pallas overlapping-window pattern.

Numerics match ops.stft.stft_magnitude(..., use_matmul_dft=True) to f32
tolerance (tests/unit/test_pallas_stft.py). center=True reflect padding is
applied by the wrapper (host-side jnp.pad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsc_tpu.ops.stft import _dft_basis_np

TILE_F = 16  # frames per tile
MAX_BASIS_VMEM = 4 * 1024 * 1024  # per-basis VMEM budget (bytes)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _stft_kernel(
    x_hbm, win_ref, cos_ref, sin_ref, out_ref, seg, frames, sem,
    *, hop: int, n_fft: int, seg_len: int, eps: float,
):
    ib = pl.program_id(0)
    jf = pl.program_id(1)
    start = jf * (TILE_F * hop)
    dma = pltpu.make_async_copy(
        x_hbm.at[ib, pl.ds(start, seg_len)], seg.at[0], sem
    )
    dma.start()
    dma.wait()
    for i in range(TILE_F):  # static unroll: hop-strided windowed copies
        frames[i, :] = seg[0, pl.ds(i * hop, n_fft)] * win_ref[0, :]
    f = frames[:]
    re = jax.lax.dot_general(
        f, cos_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    im = jax.lax.dot_general(
        f, sin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, :, :] = jnp.sqrt(re * re + im * im + eps)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "center", "interpret")
)
def stft_magnitude_pallas(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    center: bool = True,
    eps: float = 1e-8,
    interpret: bool = False,
) -> jax.Array:
    """(B, T) -> (B, frames, n_fft//2+1) |STFT|, Hann window.

    Matches ops.stft.stft_magnitude(use_matmul_dft=True) semantics."""
    assert x.ndim == 2, "pallas stft takes (B, T)"
    b, t = x.shape
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        t = x.shape[1]
    n_frames = max(0, 1 + (t - n_fft) // hop)

    k_bins = n_fft // 2 + 1
    k_pad = _round_up(k_bins, 128)
    k_tile = min(k_pad, max(128, MAX_BASIS_VMEM // (4 * n_fft) // 128 * 128))
    while k_pad % k_tile:
        k_tile -= 128
    n_k_tiles = k_pad // k_tile

    f_pad = _round_up(n_frames, TILE_F)
    n_f_tiles = f_pad // TILE_F
    seg_len = (TILE_F - 1) * hop + n_fft
    need = (n_f_tiles - 1) * TILE_F * hop + seg_len
    x = jnp.pad(x, ((0, 0), (0, max(0, need - t)))).astype(jnp.float32)

    cos_b, sin_b = _dft_basis_np(n_fft)
    cos_b = np.pad(cos_b, ((0, 0), (0, k_pad - k_bins)))
    sin_b = np.pad(sin_b, ((0, 0), (0, k_pad - k_bins)))
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )[None, :]

    out = pl.pallas_call(
        functools.partial(
            _stft_kernel, hop=hop, n_fft=n_fft, seg_len=seg_len, eps=eps
        ),
        grid=(b, n_f_tiles, n_k_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((1, n_fft), lambda ib, jf, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, k_tile), lambda ib, jf, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, k_tile), lambda ib, jf, kk: (0, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_F, k_tile), lambda ib, jf, kk: (ib, jf, kk),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, seg_len), jnp.float32),
            pltpu.VMEM((TILE_F, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, jnp.asarray(win), jnp.asarray(cos_b), jnp.asarray(sin_b))
    return out[:, :n_frames, :k_bins]
