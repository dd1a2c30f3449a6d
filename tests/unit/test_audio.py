import numpy as np

from nsc_tpu.utils import audio


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "x.wav")
    audio.save_wav(p, wav, sr)
    back, sr2 = audio.load_wav(p)
    assert sr2 == sr
    assert back.shape == wav.shape
    # 16-bit quantization error bound (scale mismatch 32767 vs 32768 included)
    assert np.max(np.abs(back - wav)) < 1e-4


def test_load_resamples(tmp_path):
    sr = 48000
    wav = np.random.RandomState(0).randn(sr).astype(np.float32) * 0.1
    p = str(tmp_path / "x.wav")
    audio.save_wav(p, wav, sr)
    back, sr2 = audio.load_wav(p, target_sr=16000)
    assert sr2 == 16000
    assert abs(back.shape[0] - 16000) <= 1


def test_resample_preserves_tone():
    sr, target = 16000, 8000
    t = np.arange(sr, dtype=np.float32) / sr
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = audio.resample(wav, sr, target)
    assert out.shape[0] == target
    # dominant DFT bin still at 440 Hz
    spec = np.abs(np.fft.rfft(out))
    peak_hz = np.argmax(spec) * target / out.shape[0]
    assert abs(peak_hz - 440) < 5


def test_to_mono_and_normalize():
    wav = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(np.float32)
    mono = audio.to_mono(wav)
    assert mono.shape == (100,)
    assert np.allclose(mono, 0.0)
    n = audio.normalize(np.array([0.1, -0.2], np.float32), peak=0.95)
    assert np.isclose(np.max(np.abs(n)), 0.95)
