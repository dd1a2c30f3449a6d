"""Factorized RVQ codes (codebook_dim != latent_dim, DAC-style projections)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.configs import get_config
from nsc_tpu.models.codec import init_codec
from nsc_tpu.train.train import init_train_state, make_train_step


def _cfg():
    return dataclasses.replace(
        get_config("tiny_test"), latent_dim=8, codebook_dim=4
    )


def test_factorized_roundtrip_shapes():
    cfg = _cfg()
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    assert params["proj_in"].shape == (8, 4)
    assert rvq["codebooks"].shape == (cfg.num_quantizers, cfg.codebook_size, 4)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 32 * cfg.hop)) * 0.1
    idx = model.encode(params, rvq, wav)
    assert idx.shape == (2, 32, cfg.num_quantizers)
    out = model.decode(params, rvq, idx)
    assert out.shape == (2, 32 * cfg.hop)


def test_factorized_training_step():
    cfg = _cfg()
    from nsc_tpu.configs import TrainConfig

    tcfg = TrainConfig(
        batch_size=2, segment_seconds=0.064, use_gan=False,
        disc_width_mult=1 / 16, stft_fft_sizes=(128,), mel_fft_size=128,
        mel_bins=10, quantizer_dropout=0.5,
    )
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(model, tcfg))
    batch = jax.random.normal(jax.random.PRNGKey(2), (2, 1024)) * 0.1
    first = None
    for _ in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss/g_total"])
    assert np.isfinite(float(metrics["loss/g_total"]))
    assert float(metrics["loss/g_total"]) < first
    # projections received gradient
    g_before = np.asarray(init_codec(jax.random.PRNGKey(0), cfg)[1]["proj_in"])
    assert not np.allclose(np.asarray(state["params_g"]["proj_in"]), g_before)


def test_factorized_streaming_matches_batch():
    from nsc_tpu import streaming

    cfg = _cfg()
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    wav = (np.random.RandomState(0).randn(32 * cfg.hop) * 0.2).astype(np.float32)
    batch_idx = np.asarray(model.encode(params, rvq, jnp.asarray(wav)[None]))[0]
    enc = streaming.StreamingEncoder(model, params, rvq)
    got = np.concatenate([enc.push(c) for c in np.split(wav, 4)], axis=0)
    np.testing.assert_array_equal(got, batch_idx)
