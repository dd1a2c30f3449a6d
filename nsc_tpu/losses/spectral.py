"""Spectral reconstruction losses (SURVEY.md §3 #12; BASELINE.json:5,9
"multi-resolution STFT/mel-spectrogram reconstruction losses").

Multi-resolution STFT loss = spectral-convergence + log-magnitude L1 over a
bank of FFT sizes (Parallel-WaveGAN formulation, canonical for this family
[INFERRED]); mel loss = L1 on log-mel. All pure JAX over the framed-STFT op
(nsc_tpu/ops/stft.py) so the Pallas STFT kernel accelerates these too.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from nsc_tpu.ops import stft as S


@dataclasses.dataclass(frozen=True)
class MultiResSTFTConfig:
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512, 256, 128)
    hop_divisor: int = 4          # hop = n_fft // 4
    win_divisor: int = 1          # win = n_fft


def _stft_mag(x: jax.Array, n_fft: int, hop: int, backend: str) -> jax.Array:
    """Loss-site STFT-magnitude dispatch (TrainConfig.stft_backend):
      'xla'    — matmul-DFT lowering (rides the MXU; shard_map-safe VJP).
      'pallas' — fused kernel (ops/pallas/stft.py), XLA VJP; TPU only,
                 silently falls back to 'xla' elsewhere.
      'pallas_interpret' — kernel in interpreter mode (CPU exactness tests).
    """
    if backend.startswith("pallas"):
        interp = backend == "pallas_interpret"
        if interp or jax.default_backend() == "tpu":
            return S.stft_magnitude_fused(x, n_fft, hop, interpret=interp)
    return S.stft_magnitude(x, n_fft, hop, use_matmul_dft=True)


def multi_res_stft_loss(
    pred: jax.Array,
    target: jax.Array,
    cfg: MultiResSTFTConfig = MultiResSTFTConfig(),
    *,
    eps: float = 1e-5,
    backend: str = "xla",
) -> jax.Array:
    """(N, T) waveforms -> scalar. Sum over resolutions of
    (spectral convergence + log-mag L1), averaged over the batch.

    Uses the matmul-DFT STFT path: it rides the MXU, and (unlike jnp.fft's
    complex VJP) differentiates cleanly inside shard_map."""
    total = jnp.asarray(0.0, jnp.float32)
    for n_fft in cfg.fft_sizes:
        hop = n_fft // cfg.hop_divisor
        p = _stft_mag(pred.astype(jnp.float32), n_fft, hop, backend)
        t = _stft_mag(target.astype(jnp.float32), n_fft, hop, backend)
        sc = jnp.linalg.norm(t - p, axis=(-2, -1)) / (
            jnp.linalg.norm(t, axis=(-2, -1)) + eps
        )
        log_l1 = jnp.mean(
            jnp.abs(jnp.log(t + eps) - jnp.log(p + eps)), axis=(-2, -1)
        )
        total = total + jnp.mean(sc) + jnp.mean(log_l1)
    return total / len(cfg.fft_sizes)


def mel_loss(
    pred: jax.Array,
    target: jax.Array,
    *,
    sample_rate: int = 16_000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    backend: str = "xla",
) -> jax.Array:
    """L1 between log-mel spectrograms, (N, T) -> scalar.

    Same magnitudes as ops.stft.mel_spectrogram(use_matmul_dft=True) (eps
    values match); the mel projection + log happen here so the stft_backend
    dispatch applies."""

    def logmel(x):
        mag = _stft_mag(x.astype(jnp.float32), n_fft, hop, backend)
        fb = S.mel_filterbank(sample_rate, n_fft, n_mels)
        return jnp.log(jnp.einsum("...tk,km->...tm", mag, fb) + 1e-5)

    return jnp.mean(jnp.abs(logmel(pred) - logmel(target)))


def time_l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))
