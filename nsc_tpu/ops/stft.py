"""Framed STFT and mel spectrograms (SURVEY.md §3 #2; hot path per
BASELINE.json:5 "framed STFT ... fused as Pallas kernels").

TPU-first design: framing is a static gather (indices precomputed at trace
time), and the DFT is available two ways:
  * `jnp.fft.rfft` — XLA's native FFT.
  * matmul against a real/imag DFT basis — lands on the MXU; for the small
    FFT sizes used by codec losses (128..2048) this is the fast path and the
    shape the Pallas fused kernel mirrors (nsc_tpu/ops/pallas/stft.py).

All functions operate on the last axis (time) and broadcast over leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    # periodic Hann (matches torch.hann_window default)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n), dtype)


def num_frames(length: int, n_fft: int, hop: int, center: bool) -> int:
    if center:
        return 1 + length // hop
    return max(0, 1 + (length - n_fft) // hop)


def frame_signal(
    x: jax.Array, n_fft: int, hop: int, *, center: bool = True
) -> jax.Array:
    """(..., T) -> (..., frames, n_fft). center=True reflect-pads n_fft//2 on
    both sides (librosa/torch default), so frame f is centered at f*hop."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    t = x.shape[-1]
    nf = max(0, 1 + (t - n_fft) // hop)
    idx = np.arange(nf)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    window: jax.Array | None = None,
    center: bool = True,
    use_matmul_dft: bool = False,
) -> jax.Array:
    """Complex STFT, (..., T) -> (..., frames, n_fft//2 + 1) complex64."""
    if window is None:
        window = hann_window(n_fft, x.dtype)
    frames = frame_signal(x, n_fft, hop, center=center) * window
    if use_matmul_dft:
        cos_b, sin_b = _dft_basis(n_fft, np.dtype(jnp.float32).name)
        re = jnp.einsum("...tf,fk->...tk", frames, cos_b)
        im = jnp.einsum("...tf,fk->...tk", frames, sin_b)
        return jax.lax.complex(re, im)
    return jnp.fft.rfft(frames, axis=-1)


def stft_magnitude(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    window: jax.Array | None = None,
    center: bool = True,
    use_matmul_dft: bool = False,
    eps: float = 1e-8,
) -> jax.Array:
    """|STFT|, computed without complex intermediates when using the matmul
    basis (re^2 + im^2 stays in real arithmetic on the MXU/VPU)."""
    if window is None:
        window = hann_window(n_fft, x.dtype)
    frames = frame_signal(x, n_fft, hop, center=center) * window
    if use_matmul_dft:
        cos_b, sin_b = _dft_basis(n_fft, np.dtype(jnp.float32).name)
        re = jnp.einsum("...tf,fk->...tk", frames, cos_b)
        im = jnp.einsum("...tf,fk->...tk", frames, sin_b)
        return jnp.sqrt(re * re + im * im + eps)
    z = jnp.fft.rfft(frames, axis=-1)
    return jnp.sqrt(z.real * z.real + z.imag * z.imag + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _stft_magnitude_fused(x, n_fft: int, hop: int, interpret: bool):
    from nsc_tpu.ops.pallas.stft import stft_magnitude_pallas

    return stft_magnitude_pallas(x, n_fft, hop, interpret=interpret)


def _fused_fwd(x, n_fft, hop, interpret):
    return _stft_magnitude_fused(x, n_fft, hop, interpret), x


def _fused_bwd(n_fft, hop, interpret, x, g):
    # Backward through the XLA matmul-DFT lowering (float-tolerance equal to
    # the kernel's forward): Pallas kernels with manual DMA aren't
    # auto-differentiable, and the VJP re-derives the framing gather +
    # DFT-basis matmuls XLA already fuses well.
    _, vjp = jax.vjp(
        lambda xx: stft_magnitude(xx, n_fft, hop, use_matmul_dft=True), x
    )
    return (vjp(g)[0],)


_stft_magnitude_fused.defvjp(_fused_fwd, _fused_bwd)


def stft_magnitude_fused(
    x: jax.Array, n_fft: int, hop: int, *, interpret: bool = False
) -> jax.Array:
    """|STFT| via the fused Pallas kernel (ops/pallas/stft.py) with the XLA
    path as its VJP — differentiable, so it drops into the spectral losses
    (losses/spectral.py stft_backend='pallas'). (B, T) only."""
    return _stft_magnitude_fused(x, n_fft, hop, interpret)


@functools.lru_cache(maxsize=32)
def _dft_basis_np(n_fft: int):
    """Real/imag rfft basis, (n_fft, n_fft//2+1). Cached as NUMPY — caching
    jnp arrays would retain jit-trace constants and leak tracers."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _dft_basis(n_fft: int, dtype: str):
    c, s = _dft_basis_np(n_fft)
    return jnp.asarray(c, dtype), jnp.asarray(s, dtype)


# ---------------------------------------------------------------------------
# mel
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def _mel_filterbank_np(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    fmax = fmax or sample_rate / 2.0
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fb = np.zeros((len(bins), n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, cen, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bins - lo) / max(cen - lo, 1e-9)
        down = (hi - bins) / max(hi - cen, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    """Triangular mel filterbank (HTK scale), (n_fft//2+1, n_mels).
    numpy is cached; the jnp conversion happens per call (trace-safe)."""
    return jnp.asarray(_mel_filterbank_np(sample_rate, n_fft, n_mels, fmin, fmax))


def mel_spectrogram(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop: int,
    n_mels: int,
    *,
    fmin: float = 0.0,
    fmax: float | None = None,
    log: bool = True,
    eps: float = 1e-5,
    use_matmul_dft: bool = False,
) -> jax.Array:
    """(..., T) -> (..., frames, n_mels); log-magnitude mel by default."""
    mag = stft_magnitude(x, n_fft, hop, use_matmul_dft=use_matmul_dft)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    mel = jnp.einsum("...tk,km->...tm", mag, fb)
    if log:
        mel = jnp.log(mel + eps)
    return mel
