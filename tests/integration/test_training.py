"""Training-mode integration tests (BASELINE.json:9-10 configs #3-#4, scaled
to CPU-feasible sizes): loss decreases, GAN losses finite, DP == single
device, checkpoint restart."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsc_tpu.configs import TrainConfig, get_config
from nsc_tpu.train.train import init_train_state, make_train_step
from nsc_tpu.train import data as data_lib


def _tiny_tcfg(**kw):
    base = dict(
        batch_size=4,
        segment_seconds=0.064,  # 1024 samples
        lr_g=1e-3, lr_d=1e-3,
        disc_width_mult=1 / 16,
        quantizer_dropout=0.5,
        stft_fft_sizes=(256, 128),
        mel_fft_size=256, mel_bins=20,
        log_every=1000, checkpoint_every=10**9,
    )
    base.update(kw)
    return TrainConfig(**base)


def _batch(tcfg, cfg, seed=0):
    src = data_lib.SyntheticSource(cfg.sample_rate, seed)
    seg = int(tcfg.segment_seconds * cfg.sample_rate)
    seg = (seg // cfg.hop) * cfg.hop
    return next(src.batches(tcfg.batch_size, seg))


def test_codec_only_loss_decreases():
    cfg = get_config("tiny_test")
    tcfg = _tiny_tcfg(use_gan=False)
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(model, tcfg))
    batch = jnp.asarray(_batch(tcfg, cfg))
    first = None
    for i in range(20):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss/g_total"])
    last = float(metrics["loss/g_total"])
    assert np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_gan_mode_losses_finite_and_d_learns():
    cfg = get_config("tiny_test")
    tcfg = _tiny_tcfg(use_gan=True)
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(model, tcfg))
    batch = jnp.asarray(_batch(tcfg, cfg))
    d_first = None
    for i in range(10):
        state, metrics = step(state, batch)
        if d_first is None:
            d_first = float(metrics["loss/d_total"])
    assert np.isfinite(float(metrics["loss/g_total"]))
    assert np.isfinite(float(metrics["loss/d_total"]))
    # D should improve on a fixed batch
    assert float(metrics["loss/d_total"]) < d_first


def test_ema_codebooks_move_during_training():
    cfg = get_config("tiny_test")
    tcfg = _tiny_tcfg(use_gan=False)
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(model, tcfg))
    cb0 = np.asarray(state["rvq"]["codebooks"]).copy()
    batch = jnp.asarray(_batch(tcfg, cfg))
    for _ in range(5):
        state, _ = step(state, batch)
    cb1 = np.asarray(state["rvq"]["codebooks"])
    assert not np.allclose(cb0, cb1)


def test_dp_step_equals_single_device():
    """Config #4's distributed logic without a slice (SURVEY.md §5): the
    shard_map DP step over 8 fake CPU devices must match the single-device
    step on the same global batch."""
    from nsc_tpu.parallel import make_mesh, make_parallel_train_step, replicate, shard_batch

    cfg = get_config("tiny_test")
    tcfg = _tiny_tcfg(use_gan=False, batch_size=8, quantizer_dropout=0.0)
    model, state_s = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = _batch(tcfg, cfg)

    # single-device reference
    single_step = jax.jit(make_train_step(model, tcfg))
    ref_state, ref_metrics = single_step(state_s, jnp.asarray(batch))

    # DP over all fake devices
    model2, state_p = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    mesh = make_mesh()
    state_p = replicate(mesh, state_p)
    pstep = make_parallel_train_step(model2, tcfg, mesh)
    new_state, metrics = pstep(state_p, shard_batch(mesh, batch))

    # losses AND the aggregated gradient norm must match: this is what proves
    # psum/pmean aggregation is numerically the global-batch computation.
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=2e-4,
            err_msg=f"metric {k} diverged between DP and single-device",
        )
    # Post-Adam params: Adam turns noise-level gradient sign flips into
    # +-lr updates, so the bound is a few lr, not float epsilon.
    ref_leaves = jax.tree.leaves(ref_state["params_g"])
    par_leaves = jax.tree.leaves(new_state["params_g"])
    for a, b in zip(ref_leaves, par_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.2, atol=4 * tcfg.lr_g
        )
    # EMA codebooks come from psum'd stats with no optimizer: tight match.
    np.testing.assert_allclose(
        np.asarray(ref_state["rvq"]["codebooks"]),
        np.asarray(new_state["rvq"]["codebooks"]),
        rtol=1e-4, atol=1e-5,
    )


def test_checkpoint_restart_bitexact(tmp_path):
    """Fault-recovery contract: save at step k, restart, and the restored
    state must continue identically (SURVEY.md §6 failure-detection row)."""
    from nsc_tpu.train import checkpoint as ckpt

    cfg = get_config("tiny_test")
    tcfg = _tiny_tcfg(use_gan=False, quantizer_dropout=0.5)
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(model, tcfg))
    batch = jnp.asarray(_batch(tcfg, cfg))
    for _ in range(3):
        state, _ = step(state, batch)
    ckpt.save(str(tmp_path / "ck"), 3, jax.tree.map(np.asarray, state))

    # continue original
    cont, m_direct = step(state, batch)

    # restore and continue
    _, fresh_state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    _, restored = ckpt.restore(str(tmp_path / "ck"), fresh_state)
    rest2, m_restored = step(restored, batch)
    np.testing.assert_allclose(
        float(m_direct["loss/g_total"]), float(m_restored["loss/g_total"]),
        rtol=1e-6,
    )


def test_checkpoint_restore_rejects_mismatched_structure(tmp_path):
    """ADVICE r2: the structure-free fallback is ONLY for supersets (extra
    calibration leaves); a checkpoint from a different config must raise a
    clear mismatch error, not restore silently."""
    from nsc_tpu.train import checkpoint as ckpt

    ckpt.save(str(tmp_path / "ck"),
              1, {"a": np.zeros((2, 3)), "b": np.ones(4)})
    # superset restore (template missing "b") still works
    _, got = ckpt.restore(str(tmp_path / "ck"), {"a": np.zeros((2, 3))})
    assert got["a"].shape == (2, 3)
    # mismatched leaf name -> clear error
    with pytest.raises((ValueError, KeyError)):
        ckpt.restore(str(tmp_path / "ck"), {"a": np.zeros((2, 3)),
                                            "c": np.zeros(4)})
    # mismatched shape -> clear error
    with pytest.raises(ValueError):
        ckpt.restore(str(tmp_path / "ck"), {"a": np.zeros((5, 3))})


def test_ct_stage_support_gate():
    """ADVICE r2 medium: configs whose receptive field exceeds the kernel's
    VMEM carry (or k != 3) must take the reference path, not assert."""
    import dataclasses

    from nsc_tpu.models.seanet import _ct_stage_supported

    cfg = get_config("base")
    assert _ct_stage_supported(cfg)  # sum(2d)=26 <= 128
    big = dataclasses.replace(cfg, dilations=(1, 3, 9, 27, 81))  # halo 242
    assert not _ct_stage_supported(big)
    k5 = dataclasses.replace(cfg, residual_kernel=5)
    assert not _ct_stage_supported(k5)
    # and the full encoder still runs (reference fallback) for such configs
    from nsc_tpu.models.codec import init_codec

    tiny_big = dataclasses.replace(
        get_config("tiny_test"), dilations=(1, 3, 9, 27, 81),
        unit_backend="auto",
    )
    model, params, rvq = init_codec(jax.random.PRNGKey(0), tiny_big)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 8 * tiny_big.hop)
                      .astype(np.float32) * 0.1)
    idx = model.encode(params, rvq, wav)
    assert np.asarray(idx).shape[1] == 8


def test_synthetic_source_deterministic_shapes():
    src = data_lib.SyntheticSource(16000, 0)
    b = next(src.batches(3, 800))
    assert b.shape == (3, 800) and b.dtype == np.float32
    assert np.abs(b).max() <= 1.0


def test_wav_directory_source(tmp_path):
    from nsc_tpu.utils import audio

    for i in range(3):
        audio.save_wav(
            str(tmp_path / f"{i}.wav"),
            np.random.RandomState(i).randn(5000).astype(np.float32) * 0.1,
            16000,
        )
    src = data_lib.WavDirectorySource(str(tmp_path), 16000)
    b = next(src.batches(2, 1000))
    assert b.shape == (2, 1000)


def test_reseed_churn_decays():
    """Dead-code reseed must settle: the rvq/reseed_frac metric starts high
    (zero-init EMA counts mean every code reseeds on step 1) and must decay
    toward ~0 as codebooks win assignments (VERDICT r1 weak #5)."""
    cfg = get_config("tiny_test")
    tcfg = _tiny_tcfg(use_gan=False)
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(model, tcfg))
    src = data_lib.SyntheticSource(cfg.sample_rate, 1)
    seg = int(tcfg.segment_seconds * cfg.sample_rate) // cfg.hop * cfg.hop
    fracs = []
    for batch in src.batches(tcfg.batch_size, seg):
        state, metrics = step(state, jnp.asarray(batch))
        fracs.append(float(metrics["rvq/reseed_frac"]))
        if len(fracs) >= 60:
            break
    assert fracs[0] > 0.9  # zero-init: (almost) everything reseeds once
    late = np.mean(fracs[-10:])
    assert late < 0.1, f"reseed churn did not settle: tail mean {late}, {fracs[-10:]}"


def test_lr_schedule_warmup_and_decay():
    """warmup_steps/lr_decay_steps must actually shape the LR (VERDICT r1
    missing #5: warmup was a dead config field)."""
    from nsc_tpu.train.train import make_lr_schedule

    tcfg = _tiny_tcfg(warmup_steps=10, lr_decay_steps=100, lr_g=1e-3)
    sched = make_lr_schedule(tcfg.lr_g, tcfg)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9  # peak after warmup
    assert float(sched(5)) == pytest.approx(5e-4, rel=1e-6)  # linear ramp
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-3)  # cosine floor
    # warmup-only variant: constant after ramp
    tcfg2 = _tiny_tcfg(warmup_steps=10)
    s2 = make_lr_schedule(tcfg2.lr_g, tcfg2)
    assert float(s2(500)) == pytest.approx(1e-3, rel=1e-6)
    # and the train step reports it
    cfg = get_config("tiny_test")
    tcfg3 = _tiny_tcfg(use_gan=False, warmup_steps=4)
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg3)
    step = jax.jit(make_train_step(model, tcfg3))
    state, metrics = step(state, jnp.asarray(_batch(tcfg3, cfg)))
    assert float(metrics["lr/g"]) == 0.0  # step 0 of a 4-step warmup


def test_decompress_rejects_foreign_stream():
    """Streams from a different model with the same sr/hop (small vs
    small_factorized, both 320-hop/16 kHz/8-bit) must be rejected, not
    silently decoded to garbage (VERDICT r1 weak #7)."""
    import nsc_tpu

    wav = (np.random.RandomState(0).randn(3200) * 0.1).astype(np.float32)
    b_small = nsc_tpu.load_model("small")
    b_fact = nsc_tpu.load_model("small_factorized")
    assert b_small.cfg.hop == b_fact.cfg.hop
    assert b_small.cfg.bits_per_codebook == b_fact.cfg.bits_per_codebook
    blob = nsc_tpu.compress(b_small, wav)
    with pytest.raises(ValueError, match="incompatible"):
        nsc_tpu.decompress(b_fact, blob)
    out = nsc_tpu.decompress(b_small, blob)  # same model still fine
    assert out.shape == wav.shape


def test_dp_inference_equals_single_device():
    """DP inference over the 8-device mesh (the north-star's deployment
    shape) must reproduce the single-device result bit-for-bit on indices
    and to float tolerance on waveforms."""
    from nsc_tpu.configs import get_config
    from nsc_tpu.models.codec import init_codec
    from nsc_tpu.parallel import make_mesh, make_parallel_infer, replicate, shard_batch

    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    wav = np.random.RandomState(0).randn(8, 16 * cfg.hop).astype(np.float32) * 0.2

    ref_idx = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    ref_wav = np.asarray(model.reconstruct(params, rvq, jnp.asarray(wav)))

    mesh = make_mesh()
    p, q = replicate(mesh, params), replicate(mesh, rvq)
    batch = shard_batch(mesh, wav)
    enc = make_parallel_infer(model, mesh, kind="encode")
    rec = make_parallel_infer(model, mesh, kind="reconstruct")
    np.testing.assert_array_equal(np.asarray(enc(p, q, batch)), ref_idx)
    np.testing.assert_allclose(
        np.asarray(rec(p, q, batch)), ref_wav, rtol=1e-5, atol=1e-6
    )


def test_prefetcher_delivers_and_propagates_errors():
    from nsc_tpu.train.data import Prefetcher, SyntheticSource

    src = SyntheticSource(16000, 0)
    pf = Prefetcher(src.batches(2, 800), depth=2)
    a = next(pf)
    b = next(pf)
    assert a.shape == b.shape == (2, 800)
    assert not np.array_equal(a, b)  # advancing, not repeating
    pf.close()

    def boom():
        yield np.zeros((1, 8), np.float32)
        raise RuntimeError("loader exploded")

    pf2 = Prefetcher(boom())
    next(pf2)
    with pytest.raises(RuntimeError, match="exploded"):
        next(pf2)
