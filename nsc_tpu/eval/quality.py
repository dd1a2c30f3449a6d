"""Quality metrics (SURVEY.md §3 #19; BASELINE.json:2,11 "PESQ/ViSQOL
scoring ... codebook-index match rate").

No pesq/visqol package is installable in this offline environment
(SURVEY.md §8 step 9), so perceptual quality is scored by a clearly-labeled
PESQ PROXY: frequency-weighted segmental SNR on a mel scale mapped through a
logistic to a MOS-like 1..4.5 range. It correlates with PESQ's ordering on
codec-style distortions (fwSegSNR is the classic objective-intelligibility
surrogate) but is NOT the ITU-T P.862 algorithm; swap in the real scorer when
network/packages exist. All metrics are host-side numpy on (T,) or (N, T).
"""

from __future__ import annotations

import numpy as np

from nsc_tpu.ops import stft as S


def _as2d(x) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return x[None] if x.ndim == 1 else x


def si_snr(ref, deg, eps: float = 1e-8) -> float:
    """Scale-invariant SNR in dB (mean over batch)."""
    r, d = _as2d(ref), _as2d(deg)
    r = r - r.mean(-1, keepdims=True)
    d = d - d.mean(-1, keepdims=True)
    proj = (np.sum(d * r, -1, keepdims=True) / (np.sum(r * r, -1, keepdims=True) + eps)) * r
    noise = d - proj
    ratio = np.sum(proj**2, -1) / (np.sum(noise**2, -1) + eps)
    return float(np.mean(10 * np.log10(ratio + eps)))


def snr(ref, deg, eps: float = 1e-8) -> float:
    r, d = _as2d(ref), _as2d(deg)
    ratio = np.sum(r**2, -1) / (np.sum((r - d) ** 2, -1) + eps)
    return float(np.mean(10 * np.log10(ratio + eps)))


def mel_distance(
    ref, deg, sample_rate: int = 16_000, n_fft: int = 1024,
    hop: int = 256, n_mels: int = 80,
) -> float:
    """L2 distance between log-mel spectrograms (the bitrate-sweep spectral
    metric; lower is better)."""
    import jax.numpy as jnp

    r = S.mel_spectrogram(jnp.asarray(_as2d(ref), jnp.float32), sample_rate, n_fft, hop, n_mels)
    d = S.mel_spectrogram(jnp.asarray(_as2d(deg), jnp.float32), sample_rate, n_fft, hop, n_mels)
    return float(np.sqrt(np.mean((np.asarray(r) - np.asarray(d)) ** 2)))


def fw_seg_snr(
    ref, deg, sample_rate: int = 16_000, n_fft: int = 512, n_mels: int = 23,
    clamp: tuple = (-10.0, 35.0),
) -> float:
    """Frequency-weighted segmental SNR (dB) on a mel filterbank — the core
    of the PESQ proxy."""
    import jax.numpy as jnp

    hop = n_fft // 2
    r = np.asarray(
        S.mel_spectrogram(jnp.asarray(_as2d(ref), jnp.float32), sample_rate,
                          n_fft, hop, n_mels, log=False)
    )
    d = np.asarray(
        S.mel_spectrogram(jnp.asarray(_as2d(deg), jnp.float32), sample_rate,
                          n_fft, hop, n_mels, log=False)
    )
    eps = 1e-8
    err = (r - d) ** 2
    band_snr = 10 * np.log10((r**2 + eps) / (err + eps))
    band_snr = np.clip(band_snr, *clamp)
    # weight by band energy (loud bands matter more)
    w = r + eps
    seg = np.sum(band_snr * w, axis=-1) / np.sum(w, axis=-1)  # (N, frames)
    # only score frames with energy (speech activity)
    active = np.sum(r, axis=-1) > 1e-4 * np.max(np.sum(r, axis=-1))
    if not np.any(active):
        return float(np.mean(seg))
    return float(np.mean(seg[active]))


def pesq_proxy(ref, deg, sample_rate: int = 16_000) -> float:
    """MOS-like score in [1, 4.5] from fwSegSNR through a logistic map.

    *** PROXY — not ITU-T P.862 PESQ (package unavailable offline). ***
    Calibrated so ~0 dB -> ~1.5 (bad), ~15 dB -> ~3.2, >=30 dB -> ~4.4.
    """
    s = fw_seg_snr(ref, deg, sample_rate)
    return float(1.0 + 3.5 / (1.0 + np.exp(-(s - 12.0) / 6.0)))


def codebook_match_rate(idx_a, idx_b) -> dict:
    """Fraction of identical indices, overall and per book (the
    BASELINE.json:2 parity metric)."""
    a, b = np.asarray(idx_a), np.asarray(idx_b)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    eq = a == b
    per_book = eq.reshape(-1, a.shape[-1]).mean(axis=0)
    return {
        "overall": float(eq.mean()),
        "per_book": [float(x) for x in per_book],
    }
