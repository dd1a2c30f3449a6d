"""Torch<->JAX parity harness (SURVEY.md §5 "Parity tests"; BASELINE.json:5
"bit-exact codebook indices + float-tolerance waveforms").

The torch twin (nsc_tpu/compat/torch_model.py) is built, its state_dict is
converted through the name-mapping table, and both stacks run the same audio:
codebook indices must match BIT-EXACTLY; waveforms within float tolerance.
Per-layer activations are compared too, so a future mismatch localizes
immediately (SURVEY.md §8 hard-part #1 mitigation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nsc_tpu.compat.torch_compat import convert_torch_checkpoint
from nsc_tpu.compat.torch_model import TorchCodec
from nsc_tpu.configs import get_config
from nsc_tpu.models import seanet
from nsc_tpu.models.codec import NeuralSpeechCodec
from nsc_tpu.ops import rvq as rvq_ops

torch.manual_seed(0)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny_test")
    tm = TorchCodec(cfg).eval()
    params, rvq = convert_torch_checkpoint(tm.state_dict(), cfg)
    model = NeuralSpeechCodec(cfg)
    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 64 * cfg.hop) * 0.3).astype(np.float32)
    return cfg, tm, model, params, rvq, wav


def test_encoder_activations_match(setup):
    cfg, tm, model, params, rvq, wav = setup
    with torch.no_grad():
        z_t = tm.encoder(torch.from_numpy(wav)[:, None, :]).numpy()
    z_j = np.asarray(
        seanet.apply_encoder(params["encoder"], jnp.asarray(wav)[..., None], cfg)
    )
    np.testing.assert_allclose(z_j, z_t.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_codebook_indices_bit_exact(setup):
    cfg, tm, model, params, rvq, wav = setup
    with torch.no_grad():
        idx_t = tm.encode(torch.from_numpy(wav)).numpy()
    idx_j = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    assert idx_j.dtype == idx_t.dtype == np.int32
    np.testing.assert_array_equal(idx_j, idx_t)


def test_decoder_waveform_float_tolerance(setup):
    cfg, tm, model, params, rvq, wav = setup
    idx = model.encode(params, rvq, jnp.asarray(wav))
    with torch.no_grad():
        wav_t = tm.decode(torch.from_numpy(np.asarray(idx))).numpy()
    wav_j = np.asarray(model.decode(params, rvq, idx))
    np.testing.assert_allclose(wav_j, wav_t, rtol=1e-3, atol=1e-4)


def test_full_pipeline_index_parity_small_config(setup):
    """Same check at a second config (wider, deeper) to exercise all stages."""
    cfg = get_config("small")
    tm = TorchCodec(cfg).eval()
    params, rvq = convert_torch_checkpoint(tm.state_dict(), cfg)
    model = NeuralSpeechCodec(cfg)
    wav = (np.random.RandomState(1).randn(1, 16 * cfg.hop) * 0.3).astype(np.float32)
    with torch.no_grad():
        idx_t = tm.encode(torch.from_numpy(wav)).numpy()
    idx_j = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    np.testing.assert_array_equal(idx_j, idx_t)


def test_variable_depth_parity(setup):
    cfg, tm, model, params, rvq, wav = setup
    with torch.no_grad():
        idx_t = tm.encode(torch.from_numpy(wav), n_q=1).numpy()
    idx_j = np.asarray(model.encode(params, rvq, jnp.asarray(wav), n_q=1))
    np.testing.assert_array_equal(idx_j, idx_t)


def test_missing_key_error_is_actionable(setup):
    cfg, tm, *_ = setup
    from nsc_tpu.compat.torch_compat import ConversionError

    sd = dict(tm.state_dict())
    sd.pop("encoder.stem.v")
    with pytest.raises(ConversionError, match="encoder.stem"):
        convert_torch_checkpoint(sd, cfg)


def test_checkpoint_file_roundtrip(setup, tmp_path):
    cfg, tm, model, params, rvq, wav = setup
    from nsc_tpu.compat.torch_compat import load_torch_checkpoint_file

    p = str(tmp_path / "twin.pt")
    torch.save(tm.state_dict(), p)
    params2, rvq2 = load_torch_checkpoint_file(p, cfg)
    idx_a = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    idx_b = np.asarray(model.encode(params2, rvq2, jnp.asarray(wav)))
    np.testing.assert_array_equal(idx_a, idx_b)


def test_factorized_index_parity():
    """Factorized codes (codebook_dim != latent_dim): converter emits the
    projection weights and the twin applies them — indices stay bit-exact."""
    import dataclasses

    cfg = dataclasses.replace(get_config("tiny_test"), codebook_dim=4)
    tm = TorchCodec(cfg).eval()
    assert tm.factorized
    params, rvq = convert_torch_checkpoint(tm.state_dict(), cfg)
    assert "proj_in" in params and "proj_out" in params
    model = NeuralSpeechCodec(cfg)
    wav = (np.random.RandomState(2).randn(2, 32 * cfg.hop) * 0.3).astype(np.float32)
    with torch.no_grad():
        idx_t = tm.encode(torch.from_numpy(wav)).numpy()
    idx_j = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    np.testing.assert_array_equal(idx_j, idx_t)
    idx = jnp.asarray(idx_t)
    with torch.no_grad():
        wav_t = tm.decode(torch.from_numpy(idx_t)).numpy()
    wav_j = np.asarray(model.decode(params, rvq, idx))
    np.testing.assert_allclose(wav_j, wav_t, rtol=1e-3, atol=1e-4)


def test_snake_fast_index_parity():
    """The SERVING activation (snake_fast, the bench path) is parity-tested
    too, not just the exact-sine one: the twin evaluates the identical
    polynomial in the same op order, so f32 indices are bit-exact."""
    import dataclasses

    cfg = dataclasses.replace(get_config("tiny_test"), activation="snake_fast")
    tm = TorchCodec(cfg).eval()
    params, rvq = convert_torch_checkpoint(tm.state_dict(), cfg)
    model = NeuralSpeechCodec(cfg)
    wav = (np.random.RandomState(3).randn(2, 48 * cfg.hop) * 0.3).astype(np.float32)
    with torch.no_grad():
        idx_t = tm.encode(torch.from_numpy(wav)).numpy()
    idx_j = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    np.testing.assert_array_equal(idx_j, idx_t)


def test_noncausal_index_parity():
    """Non-causal ('same'-padded) variant: encoder indices AND decoded
    waveforms parity, covering the split-trim transposed convs."""
    import dataclasses

    cfg = dataclasses.replace(get_config("tiny_test"), causal=False)
    tm = TorchCodec(cfg).eval()
    params, rvq = convert_torch_checkpoint(tm.state_dict(), cfg)
    model = NeuralSpeechCodec(cfg)
    wav = (np.random.RandomState(4).randn(2, 32 * cfg.hop) * 0.3).astype(np.float32)
    with torch.no_grad():
        idx_t = tm.encode(torch.from_numpy(wav)).numpy()
    idx_j = np.asarray(model.encode(params, rvq, jnp.asarray(wav)))
    np.testing.assert_array_equal(idx_j, idx_t)
    with torch.no_grad():
        wav_t = tm.decode(torch.from_numpy(idx_t)).numpy()
    wav_j = np.asarray(model.decode(params, rvq, jnp.asarray(idx_t)))
    np.testing.assert_allclose(wav_j, wav_t, rtol=1e-3, atol=1e-4)
