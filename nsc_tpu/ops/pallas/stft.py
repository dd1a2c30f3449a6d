"""Pallas TPU kernel: fused framed-STFT magnitude (BASELINE.json:5 names
"framed STFT" as a mandated fused hot path; SURVEY.md §3 #2).

The XLA matmul-DFT path (ops/stft.py) materializes the framed signal
(B, frames, n_fft) in HBM — an n_fft/hop x duplication of the input (4x for
the loss configs) round-tripped per resolution. This kernel instead:

  1. host/XLA side: gathers x into TILE-LEVEL segments (B, n_f_tiles,
     seg_len) — overlapping by n_fft - hop at tile granularity only, a
     1 + (n_fft-hop)/(TILE_F*hop) ~= 1.19x duplication (vs 4x per-frame);
  2. kernel: one grid step per (batch row, K-tile) holds the row's whole
     segment array in VMEM, loops over frame tiles (lax.fori_loop), expands
     each tile to its TILE_F hop-strided windowed frames (static unroll),
     applies the real/imag DFT bases on the MXU, and writes only |STFT|.

Two earlier formulations fail Mosaic on real TPUs (caught on-chip, not by
interpret mode): manual async copies of single (B, T) rows break the (8, 128)
DMA tile-alignment rule, and BlockSpec blocks of (1, 1, seg_len) over
(B, n_f_tiles, seg_len) break the "last two block dims divisible by (8, 128)
or equal to the array dims" rule. Hence: block = (1, n_f_tiles, seg_len)
(both trailing dims equal to the array's), dynamic-offset slices inside.

Numerics match ops.stft.stft_magnitude(..., use_matmul_dft=True) to f32
tolerance (tests/unit/test_pallas_stft.py; on-chip check in bench_suite.py).
center=True reflect padding is applied by the wrapper (host-side jnp.pad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsc_tpu.ops.stft import _dft_basis_np

TILE_F = 16  # frames per tile; TILE_F * hop is 128-aligned for hop >= 8
MAX_BASIS_VMEM = 4 * 1024 * 1024  # per-basis VMEM budget (bytes)
_EPS = 1e-8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _stft_kernel(
    seg_ref, win_ref, cos_ref, sin_ref, out_ref, row, frames,
    *, hop: int, n_fft: int, n_f_tiles: int, eps: float,
):
    def tile_body(jf, _):
        # two-step: dynamic-sublane full-row read (aligned), THEN static
        # unaligned lane slices — Mosaic rejects the combined
        # dynamic+unaligned load ("dynamic load with unaligned indices")
        row[0, :] = seg_ref[0, jf, :]
        for i in range(TILE_F):  # static unroll: hop-strided windowed copies
            frames[i, :] = row[0, pl.ds(i * hop, n_fft)] * win_ref[0, :]
        f = frames[:]
        re = jax.lax.dot_general(
            f, cos_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        im = jax.lax.dot_general(
            f, sin_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, pl.ds(jf * TILE_F, TILE_F), :] = jnp.sqrt(
            re * re + im * im + eps
        )
        return 0

    jax.lax.fori_loop(0, n_f_tiles, tile_body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "center", "interpret")
)
def stft_magnitude_pallas(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    center: bool = True,
    eps: float = _EPS,
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

    # tile-level segment gather: (B, n_f_tiles, seg_len), contiguous strided
    # slices (XLA lowers to copies; ~1.19x duplication, not 4x per-frame)
    seg_idx = (
        np.arange(n_f_tiles)[:, None] * (TILE_F * hop)
        + np.arange(seg_len)[None, :]
    )
    segs = x[:, seg_idx]

    cos_b, sin_b = _dft_basis_np(n_fft)
    cos_b = np.pad(cos_b, ((0, 0), (0, k_pad - k_bins)))
    sin_b = np.pad(sin_b, ((0, 0), (0, k_pad - k_bins)))
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )[None, :]

    out = pl.pallas_call(
        functools.partial(
            _stft_kernel, hop=hop, n_fft=n_fft, n_f_tiles=n_f_tiles, eps=eps
        ),
        grid=(b, n_k_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, n_f_tiles, seg_len), lambda ib, kk: (ib, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, n_fft), lambda ib, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, k_tile), lambda ib, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, k_tile), lambda ib, kk: (0, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f_pad, k_tile), lambda ib, kk: (ib, 0, kk),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, f_pad, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, seg_len), jnp.float32),
            pltpu.VMEM((TILE_F, n_fft), jnp.float32),
        ],
        interpret=interpret,
    )(segs, jnp.asarray(win), jnp.asarray(cos_b), jnp.asarray(sin_b))
    return out[:, :n_frames, :k_bins]
