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


def stoi_proxy(
    ref, deg, sample_rate: int = 16_000, n_fft: int = 512,
    seg_frames: int = 30, beta_db: float = -15.0,
) -> float:
    """Short-time objective intelligibility PROXY in ~[0, 1] (higher=better).

    *** PROXY — not the Taal et al. STOI reference implementation. ***
    Same construction, differently built from the PESQ proxy (VERDICT r1
    item 9: a second, independently-constructed perceptual axis):
    1/3-octave band envelopes from the framed STFT, short-time segments
    (~0.5 s), degraded envelope normalized + clipped at +beta dB, then
    band/segment-wise Pearson correlation, averaged. Tracks intelligibility-
    style degradations (temporal envelope damage) that an SNR-family metric
    under-weights.
    """
    import jax.numpy as jnp

    hop = n_fft // 2
    # matmul-DFT magnitudes: jnp.fft's complex rfft is UNIMPLEMENTED on the
    # TPU backend here; the MXU basis-matmul path works everywhere
    r = np.asarray(S.stft_magnitude(
        jnp.asarray(_as2d(ref), jnp.float32), n_fft, hop, use_matmul_dft=True
    ))
    d = np.asarray(S.stft_magnitude(
        jnp.asarray(_as2d(deg), jnp.float32), n_fft, hop, use_matmul_dft=True
    ))
    # 1/3-octave bands, 150 Hz .. ~4.3 kHz (15 bands)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    centers = 150.0 * 2.0 ** (np.arange(15) / 3.0)
    lo, hi = centers / 2 ** (1 / 6), centers * 2 ** (1 / 6)
    bands = (freqs[None, :] >= lo[:, None]) & (freqs[None, :] < hi[:, None])
    bands = bands.astype(np.float64)  # (15, K)
    # band envelopes: (N, frames, 15)
    er = np.sqrt(np.einsum("nfk,bk->nfb", r.astype(np.float64) ** 2, bands) + 1e-12)
    ed = np.sqrt(np.einsum("nfk,bk->nfb", d.astype(np.float64) ** 2, bands) + 1e-12)

    n, frames, nb = er.shape
    if frames < seg_frames:
        seg_frames = frames
    clip = 10.0 ** (-beta_db / 20.0)
    scores = []
    for s0 in range(0, frames - seg_frames + 1, seg_frames):
        x = er[:, s0 : s0 + seg_frames, :]  # (N, M, B)
        y = ed[:, s0 : s0 + seg_frames, :]
        # normalize degraded to the clean segment's energy, clip upward dev.
        alpha = np.sqrt(
            np.sum(x**2, axis=1, keepdims=True)
            / (np.sum(y**2, axis=1, keepdims=True) + 1e-12)
        )
        yn = np.minimum(y * alpha, x * clip)
        xm = x - x.mean(axis=1, keepdims=True)
        ym = yn - yn.mean(axis=1, keepdims=True)
        num = np.sum(xm * ym, axis=1)
        den = np.sqrt(np.sum(xm**2, axis=1) * np.sum(ym**2, axis=1)) + 1e-12
        corr = num / den  # (N, B)
        # weight by reference band energy: bands the clean signal doesn't
        # occupy carry no intelligibility information (pure STOI averages
        # uniformly but assumes broadband speech input)
        w = np.sum(x**2, axis=1) + 1e-12  # (N, B)
        scores.append(np.sum(corr * w, axis=-1) / np.sum(w, axis=-1))
    if not scores:
        return 0.0
    return float(np.mean(np.stack(scores)))


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
