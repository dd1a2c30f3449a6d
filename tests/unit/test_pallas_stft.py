"""Pallas STFT kernel vs XLA matmul-DFT reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsc_tpu.ops import stft as S
from nsc_tpu.ops.pallas import stft as PS


@pytest.mark.parametrize("n_fft,hop,t", [(256, 64, 4096), (512, 128, 4000), (128, 32, 1000)])
def test_pallas_stft_matches_reference(n_fft, hop, t):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t), jnp.float32)
    ref = S.stft_magnitude(x, n_fft, hop, use_matmul_dft=True)
    got = PS.stft_magnitude_pallas(x, n_fft, hop, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_stft_no_center():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2048), jnp.float32)
    ref = S.stft_magnitude(x, 256, 64, center=False, use_matmul_dft=True)
    got = PS.stft_magnitude_pallas(x, 256, 64, center=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_stft_tone_peak():
    sr, f0 = 16000, 1000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t)[None].astype(np.float32))
    mag = np.asarray(PS.stft_magnitude_pallas(x, 512, 128, interpret=True))
    peak_bin = mag.mean(axis=1).argmax()
    assert abs(peak_bin * sr / 512 - f0) < sr / 512
