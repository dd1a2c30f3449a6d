import jax.numpy as jnp
import numpy as np
import scipy.signal

from nsc_tpu.ops import stft as S


def test_stft_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.randn(4096).astype(np.float32)
    n_fft, hop = 256, 64
    ours = np.asarray(S.stft(jnp.asarray(x), n_fft, hop, center=False))
    win = scipy.signal.get_window("hann", n_fft, fftbins=True)
    _, _, ref = scipy.signal.stft(
        x, window=win, nperseg=n_fft, noverlap=n_fft - hop,
        boundary=None, padded=False, return_onesided=True,
    )
    ref = (ref * win.sum()).T  # scipy normalizes by window sum
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_matmul_dft_equals_rfft():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 2048).astype(np.float32)
    for n_fft, hop in [(128, 32), (512, 128), (1024, 256)]:
        a = np.asarray(S.stft_magnitude(jnp.asarray(x), n_fft, hop))
        b = np.asarray(
            S.stft_magnitude(jnp.asarray(x), n_fft, hop, use_matmul_dft=True)
        )
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_frame_count_and_center():
    x = jnp.zeros(1000)
    f = S.frame_signal(x, 256, 100, center=True)
    assert f.shape == (1 + 1000 // 100, 256)
    f = S.frame_signal(x, 256, 100, center=False)
    assert f.shape == (1 + (1000 - 256) // 100, 256)


def test_mel_filterbank_shape_and_coverage():
    fb = np.asarray(S.mel_filterbank(16000, 1024, 80))
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # every mel band has some support
    assert np.all(fb.sum(axis=0) > 0)


def test_mel_spectrogram_tone_peak():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * 1000 * t)
    mel = np.asarray(
        S.mel_spectrogram(jnp.asarray(x), sr, 1024, 256, 80, log=False)
    )
    assert mel.ndim == 2
    # energy concentrated around the 1 kHz mel band on average
    band = mel.mean(axis=0).argmax()
    fb = np.asarray(S.mel_filterbank(sr, 1024, 80))
    freqs = np.fft.rfftfreq(1024, 1 / sr)
    center = freqs[fb[:, band].argmax()]
    assert 800 < center < 1300


def test_batched_broadcasting():
    x = jnp.zeros((3, 5, 1600))
    m = S.stft_magnitude(x, 256, 64)
    assert m.shape[:2] == (3, 5)
