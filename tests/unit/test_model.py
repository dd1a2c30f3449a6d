import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.configs import get_config
from nsc_tpu.models.codec import init_codec, param_count
from nsc_tpu.models import seanet


def test_encoder_decoder_shapes():
    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    wav = jnp.zeros((2, 64 * cfg.hop))
    idx = model.encode(params, rvq, wav)
    assert idx.shape == (2, 64, cfg.num_quantizers)
    out = model.decode(params, rvq, idx)
    assert out.shape == (2, 64 * cfg.hop)


def test_encoder_causality():
    """Latent frame f must not depend on samples after (f+1)*hop."""
    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    wav = jax.random.normal(key, (1, 40 * cfg.hop)) * 0.1
    z1 = seanet.apply_encoder(params["encoder"], wav[..., None], cfg)
    wav2 = wav.at[:, 20 * cfg.hop :].set(0.9)
    z2 = seanet.apply_encoder(params["encoder"], wav2[..., None], cfg)
    np.testing.assert_allclose(
        np.asarray(z1[:, :20]), np.asarray(z2[:, :20]), atol=1e-5
    )
    # and later frames DO differ (the perturbation is visible)
    assert not np.allclose(np.asarray(z1[:, 25:]), np.asarray(z2[:, 25:]), atol=1e-3)


def test_forward_differentiable_end_to_end():
    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 16 * cfg.hop)) * 0.1

    def loss(p):
        recon, fwd, _ = model.forward(p, rvq, wav)
        return jnp.mean((recon - wav) ** 2) + fwd.commit_loss

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # encoder receives gradient through the STE
    enc_norm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g["encoder"]))
    assert enc_norm > 0


def test_reconstruct_jits_once():
    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(lambda p, q, w: model.reconstruct(p, q, w))
    wav = jnp.zeros((1, 8 * cfg.hop))
    out = fn(params, rvq, wav)
    assert out.shape == wav.shape


def test_base_config_param_count_sane():
    cfg = get_config("base")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    n = param_count(params)
    # SEANet-class codec: ~10-100M params [INFERRED, SURVEY.md §3 #17]
    assert 1_000_000 < n < 100_000_000


def test_bucketed_encode_identical():
    """api.encode pads causal inputs to power-of-two frame buckets (few
    compiled programs for arbitrary lengths); trimmed indices must be
    bit-identical to a tight-length encode, for lengths around the bucket
    edges and non-hop-multiples."""
    from nsc_tpu import api
    from nsc_tpu.configs import get_config

    bundle = api.load_model("tiny_test")
    cfg = bundle.cfg
    rng = np.random.RandomState(0)
    for t in (cfg.hop * 63, cfg.hop * 64, cfg.hop * 64 + 1, cfg.hop * 65,
              cfg.hop * 100 + 7, 123):
        wav = (rng.randn(t) * 0.2).astype(np.float32)
        idx = api.encode(bundle, wav)
        assert idx.shape[0] == (t + cfg.hop - 1) // cfg.hop, t
        # tight reference: pad to hop multiple only, run the model directly
        tight = np.pad(wav, (0, (-t) % cfg.hop))[None]
        ref = np.asarray(
            bundle.model.encode(bundle.params, bundle.rvq, jnp.asarray(tight))
        )[0]
        np.testing.assert_array_equal(idx, ref, err_msg=f"t={t}")


def test_bucketed_roundtrip_lengths():
    from nsc_tpu import api

    bundle = api.load_model("tiny_test")
    rng = np.random.RandomState(1)
    for t in (123, 4001, 9000):
        wav = (rng.randn(t) * 0.2).astype(np.float32)
        out = api.decompress(bundle, api.compress(bundle, wav))
        assert out.shape == wav.shape, t


def test_serving_config_loads_and_roundtrips():
    from nsc_tpu import api

    bundle = api.load_model("tiny_test", serving=True)
    assert bundle.cfg.rvq_backend == "pallas"
    assert bundle.cfg.unit_backend == "auto"
    assert bundle.cfg.activation == "snake_fast"
    assert bundle.cfg.compute_dtype == "bfloat16"
    assert bundle.cfg.name == "tiny_test"  # bitstream identity unchanged
    wav = (np.random.RandomState(0).randn(2000) * 0.1).astype(np.float32)
    out = api.decompress(bundle, api.compress(bundle, wav))
    assert out.shape == wav.shape


def test_bucketed_decode_identical():
    from nsc_tpu import api

    bundle = api.load_model("tiny_test")
    rng = np.random.RandomState(2)
    cfg = bundle.cfg
    for f in (5, 63, 64, 65, 100):
        idx = rng.randint(0, cfg.codebook_size, (f, cfg.num_quantizers)).astype(np.int32)
        out = api.decode(bundle, idx)
        assert out.shape == (f * cfg.hop,)
        ref = np.asarray(
            bundle.model.decode(bundle.params, bundle.rvq, jnp.asarray(idx[None]))
        )[0]
        # causality makes the computation identical; XLA's shape-dependent
        # fusion choices reorder float ops at the 1-ulp level
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6,
                                   err_msg=f"frames={f}")


def test_decode_latents_matches_decode_on_dequantized():
    """decode(indices) must equal decode_latents(dequantize(indices)) exactly
    — decode_latents is the same path minus quantization, so feeding it the
    quantized latents reproduces decode bit-for-bit. Also checks the
    factorized config (project_out inside decode_latents)."""
    import dataclasses

    from nsc_tpu.ops import rvq as rvq_ops

    tiny = get_config("tiny_test")
    for cfg in (tiny, dataclasses.replace(tiny, latent_dim=8, codebook_dim=4)):
        model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
        wav = jax.random.normal(jax.random.PRNGKey(2), (2, 16 * cfg.hop)) * 0.1
        idx = model.encode(params, rvq, wav)
        want = np.asarray(model.decode(params, rvq, idx))
        z = rvq_ops.dequantize(rvq, idx)
        got = np.asarray(model.decode_latents(params, z))
        np.testing.assert_array_equal(got, want)
        # the ceiling path runs end-to-end and beats (or ties) quantized
        # reconstruction error on the training input by construction is NOT
        # asserted here (random init makes it noisy) — scripts/rd_ceiling.py
        # measures it on trained artifacts.
        ae = np.asarray(
            model.decode_latents(params, model.latents(params, wav))
        )
        assert ae.shape == want.shape and np.isfinite(ae).all()
