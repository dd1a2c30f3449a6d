import numpy as np
import pytest

import nsc_tpu
from nsc_tpu.eval import quality, sweep


def _tone(f=440.0, sec=1.0, sr=16000, amp=0.5):
    t = np.arange(int(sec * sr)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_si_snr_identity_and_noise():
    x = _tone()
    assert quality.si_snr(x, x) > 60
    noisy = x + 0.1 * np.random.RandomState(0).randn(len(x)).astype(np.float32)
    mid = quality.si_snr(x, noisy)
    worse = quality.si_snr(x, x + 0.5 * np.random.RandomState(1).randn(len(x)).astype(np.float32))
    assert worse < mid < 60
    # scale invariance (checked away from the eps-limited perfect case)
    assert abs(quality.si_snr(x, 0.3 * noisy) - quality.si_snr(x, noisy)) < 1e-4


def test_pesq_proxy_orders_degradations():
    x = _tone()
    rng = np.random.RandomState(0)
    mild = x + 0.01 * rng.randn(len(x)).astype(np.float32)
    severe = x + 0.5 * rng.randn(len(x)).astype(np.float32)
    p_clean = quality.pesq_proxy(x, x)
    p_mild = quality.pesq_proxy(x, mild)
    p_severe = quality.pesq_proxy(x, severe)
    assert 1.0 <= p_severe < p_mild <= p_clean <= 4.5
    assert p_clean > 4.0


def test_mel_distance_zero_on_identity():
    x = _tone()
    assert quality.mel_distance(x, x) < 1e-6
    assert quality.mel_distance(x, np.zeros_like(x)) > 0.1


def test_codebook_match_rate():
    a = np.zeros((10, 4), np.int32)
    b = a.copy()
    b[:5, 0] = 1
    r = quality.codebook_match_rate(a, b)
    assert r["overall"] == pytest.approx(1 - 5 / 40)
    assert r["per_book"][0] == pytest.approx(0.5)
    assert r["per_book"][1] == 1.0
    with pytest.raises(ValueError):
        quality.codebook_match_rate(a, a[:5])


def test_bitrate_sweep_structure_and_monotone_latent_convergence():
    bundle = nsc_tpu.load_model("tiny_test")
    rng = np.random.RandomState(0)
    wavs = (rng.randn(2, 64 * bundle.cfg.hop) * 0.2).astype(np.float32)
    rows = sweep.bitrate_sweep(bundle, wavs)
    assert [r["n_q"] for r in rows] == [1, 2]
    assert rows[1]["bitrate_bps"] == 2 * rows[0]["bitrate_bps"]
    for r in rows:
        assert np.isfinite(r["si_snr_db"]) and np.isfinite(r["pesq_proxy"])
        # arithmetic-coded payload carries per-plane overhead but must stay
        # in the same ballpark as the nominal fixed-width rate (random-init
        # codebooks have near-uniform usage, so no big win is expected HERE;
        # the trained-checkpoint win is recorded by bench_suite config 5)
        assert 0 < r["entropy_bitrate_bps"] < 2.0 * r["bitrate_bps"] + 4000
    # deeper RVQ -> decode converges toward the full-depth reconstruction
    full = nsc_tpu.decode(bundle, nsc_tpu.encode(bundle, wavs))
    d = []
    for n_q in (1, 2):
        rec = nsc_tpu.decode(bundle, nsc_tpu.encode(bundle, wavs, n_q=n_q))
        d.append(float(np.mean((rec - full) ** 2)))
    assert d[1] <= d[0]


def test_sweep_with_reference_match_rate():
    bundle = nsc_tpu.load_model("tiny_test")
    rng = np.random.RandomState(1)
    wavs = (rng.randn(1, 32 * bundle.cfg.hop) * 0.2).astype(np.float32)
    rows = sweep.bitrate_sweep(bundle, wavs, reference_bundle=bundle)
    assert all(r["index_match"] == 1.0 for r in rows)


def test_eval_cli_json(capsys):
    rc = sweep.main(
        ["--model", "tiny_test", "--data", "synthetic", "--seconds", "0.5",
         "--batch", "1", "--json"]
    )
    assert rc == 0
    import json

    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 2 and rows[0]["n_q"] == 1


def test_stoi_faithful_anchors_and_ordering():
    """Faithful Taal-2011 STOI (VERDICT r2 missing #4): identity ~1.0,
    monotone under increasing additive noise, near-zero on unrelated noise,
    and the existing proxy agrees with its ordering."""
    rng = np.random.RandomState(0)
    t = np.arange(48000) / 16000.0  # 3 s: plenty of 384 ms segments
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    ref = env * (
        np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
    )
    degs = [
        ref,
        ref + 0.02 * rng.randn(ref.size),
        ref + 0.2 * rng.randn(ref.size),
        ref + 0.8 * rng.randn(ref.size),
        rng.randn(ref.size),
    ]
    faithful = [quality.stoi(ref, d) for d in degs]
    assert faithful[0] > 0.999  # identity
    for a, b in zip(faithful, faithful[1:]):
        assert a > b  # strictly monotone in degradation
    assert faithful[-1] < 0.4  # unrelated noise ~ unintelligible
    # proxy ordering agrees with the faithful metric on the same degradations
    proxy = [quality.stoi_proxy(ref, d) for d in degs]
    assert np.array_equal(np.argsort(faithful), np.argsort(proxy))


def test_stoi_faithful_silent_frame_removal_and_short_input():
    rng = np.random.RandomState(1)
    t = np.arange(48000) / 16000.0
    ref = np.sin(2 * np.pi * 300 * t) * (t > 1.5)  # leading silence
    deg = ref + 0.1 * rng.randn(ref.size)
    # silence (where the codec can't lose intelligibility) must not inflate
    # the score: the silent 1.5 s is removed before scoring
    s = quality.stoi(ref, deg)
    active = slice(24000, None)
    s_active = quality.stoi(ref[active], deg[active])
    assert abs(s - s_active) < 0.05
    with pytest.raises(ValueError, match="too short"):
        quality.stoi(np.zeros(1000), np.zeros(1000))


def test_visqol_nsim_identity_ordering_and_range():
    x = _tone(sec=2.0)
    rng = np.random.RandomState(0)
    mild = x + 0.01 * rng.randn(len(x)).astype(np.float32)
    severe = x + 0.3 * rng.randn(len(x)).astype(np.float32)
    s_clean = quality.visqol_nsim(x, x)
    s_mild = quality.visqol_nsim(x, mild)
    s_severe = quality.visqol_nsim(x, severe)
    # identical gammatone images -> luminance and structure terms are both
    # exactly 1 at every t-f point
    assert s_clean == pytest.approx(1.0, abs=1e-9)
    assert s_severe < s_mild < s_clean
    assert 0.0 <= s_severe <= 1.0 + 1e-9
    # severe broadband noise must cost a lot of similarity
    assert s_severe < 0.9


def test_visqol_nsim_tracks_spectral_damage_not_just_gain():
    # NSIM's luminance term forgives small constant-gain offsets far more
    # than spectral reshaping of the same energy — the perceptual property
    # SNR-family metrics lack (a 1 dB level change is near-inaudible; a
    # lowpass at the same SNR is obvious).
    x = _tone(sec=2.0) + _tone(f=2200.0, sec=2.0, amp=0.25)
    gain = (x * 10 ** (-1.0 / 20)).astype(np.float32)  # -1 dB
    # crude lowpass: zero the 2.2 kHz component entirely
    lowpassed = _tone(sec=2.0).astype(np.float32)
    s_gain = quality.visqol_nsim(x, gain)
    s_lp = quality.visqol_nsim(x, lowpassed)
    assert s_lp < s_gain
    assert s_gain > 0.98


def test_visqol_nsim_gammatone_matrix_shape_and_normalization():
    gt = quality._gammatone_matrix(512, 16000, n_bands=21)
    assert gt.shape == (21, 257)
    np.testing.assert_allclose(gt.sum(axis=1), 1.0, rtol=1e-12)
    # center frequencies must be ordered and within [50, 8000]
    peaks = gt.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_stoi_proxy_orders_degradations():
    """Second perceptual proxy (VERDICT r1 item 9): identity ~1, mild noise
    beats heavy noise, envelope destruction scores low."""
    from nsc_tpu.eval import quality

    rng = np.random.RandomState(0)
    t = np.arange(32000) / 16000.0
    # speech-like: AM-modulated harmonics
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    ref = env * (
        np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
    )
    ident = quality.stoi_proxy(ref, ref)
    mild = quality.stoi_proxy(ref, ref + 0.05 * rng.randn(ref.size))
    heavy = quality.stoi_proxy(ref, ref + 0.8 * rng.randn(ref.size))
    scrambled = quality.stoi_proxy(ref, rng.randn(ref.size))
    assert ident > 0.99
    assert ident >= mild > heavy > scrambled
    assert scrambled < 0.6


def test_main_cli_eval_two_files(tmp_path, capsys):
    """`python -m nsc_tpu eval ref.wav deg.wav --json` scores the pair
    directly (no model load)."""
    import json

    from nsc_tpu import __main__ as cli
    from nsc_tpu.utils import audio

    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    ref = (env * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    deg = (ref + 0.05 * rng.randn(ref.size)).astype(np.float32)
    rp, dp = str(tmp_path / "ref.wav"), str(tmp_path / "deg.wav")
    audio.save_wav(rp, ref, 16000)
    audio.save_wav(dp, deg, 16000)

    assert cli.main(["eval", rp, dp, "--json"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("si_snr_db", "mel_distance", "pesq_proxy", "stoi_proxy", "stoi"):
        assert k in m and np.isfinite(m[k])
    assert m["si_snr_db"] > 10  # mild noise
    # identity comparison scores (near-)perfectly
    assert cli.main(["eval", rp, rp, "--json"]) == 0
    ident = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ident["si_snr_db"] > m["si_snr_db"] and ident["stoi"] > 0.99


def test_main_cli_eval_roundtrip(tmp_path, capsys):
    """`eval` with one file round-trips it through the model and reports a
    payload bitrate alongside the metric set."""
    import json

    from nsc_tpu import __main__ as cli
    from nsc_tpu.utils import audio

    rng = np.random.RandomState(1)
    wav = (rng.randn(16000) * 0.2).astype(np.float32)
    rp = str(tmp_path / "in.wav")
    audio.save_wav(rp, wav, 16000)
    assert cli.main(["eval", rp, "--model", "tiny_test", "--json"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["bitrate_kbps"] > 0
    assert "pesq_proxy" in m and np.isfinite(m["pesq_proxy"])


def test_main_cli_eval_ceiling(tmp_path, capsys):
    """`eval <wav> --ceiling` adds the infinite-bitrate autoencoder bound
    and the quantization gap (r5): gap == roundtrip mel − ceiling mel, and
    the ceiling must not exceed the quantized round-trip's mel (no depth
    can beat the un-quantized latent path)."""
    import json

    from nsc_tpu import __main__ as cli
    from nsc_tpu.utils import audio

    rng = np.random.RandomState(2)
    wav = (rng.randn(16000) * 0.2).astype(np.float32)
    rp = str(tmp_path / "in.wav")
    audio.save_wav(rp, wav, 16000)
    assert cli.main(
        ["eval", rp, "--model", "tiny_test", "--ceiling", "--json"]
    ) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("ceiling_mel_distance", "ceiling_si_snr_db", "quant_gap_mel"):
        assert k in m and np.isfinite(m[k])
    assert abs(
        m["quant_gap_mel"] - (m["mel_distance"] - m["ceiling_mel_distance"])
    ) < 2e-4  # both sides rounded to 4 decimals
