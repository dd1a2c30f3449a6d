"""int8 W8A8 path: op-level closeness + model-level quality preservation
(measured on the trained demo checkpoint)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.configs import get_config
from nsc_tpu.ops import conv as C
from nsc_tpu.ops import quant as Q


def test_int8_conv_close_to_float():
    p = C.init_conv(jax.random.PRNGKey(0), 5, 16, 24)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 16))
    ref = np.asarray(C.conv1d(x, p, dilation=3))
    got = np.asarray(Q.conv1d_int8(x, p, dilation=3))
    # W8A8 error bound: ~1% relative of dynamic range
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.02 * scale


def test_int8_conv_transpose_close():
    p = C.init_conv(jax.random.PRNGKey(2), 8, 12, 6)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 40, 12))
    ref = np.asarray(C.conv_transpose1d(x, p, stride=4, causal=True))
    got = np.asarray(Q.conv_transpose1d_int8(x, p, stride=4))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.02 * scale


def test_int8_model_end_to_end_quality():
    """On the trained demo checkpoint: int8 decode must stay close to the
    float decode (mel distance budget), and most indices must agree."""
    import nsc_tpu
    from nsc_tpu.eval.quality import mel_distance
    from nsc_tpu.models.codec import NeuralSpeechCodec

    ckpt = os.path.join(os.path.dirname(__file__), "../../artifacts/small_synthetic_10k")
    bundle = nsc_tpu.load_model("small", checkpoint=ckpt)
    q_model = NeuralSpeechCodec(dataclasses.replace(bundle.cfg, quant="int8"))

    rng = np.random.RandomState(0)
    t = np.arange(32000) / 16000
    wav = (0.4 * np.sin(2 * np.pi * (120 + 30 * t) * t)).astype(np.float32)[None]

    idx_f = np.asarray(bundle.model.encode(bundle.params, bundle.rvq, jnp.asarray(wav)))
    idx_q = np.asarray(q_model.encode(bundle.params, bundle.rvq, jnp.asarray(wav)))
    match = (idx_f == idx_q).mean()
    assert match > 0.7, f"int8 index agreement too low: {match}"

    out_f = np.asarray(bundle.model.decode(bundle.params, bundle.rvq, jnp.asarray(idx_f)))
    out_q = np.asarray(q_model.decode(bundle.params, bundle.rvq, jnp.asarray(idx_f)))
    d = mel_distance(out_f[0], out_q[0])
    assert d < 0.2, f"int8 decode mel drift too large: {d}"


def test_int8_static_calibration():
    """quantize_model(): per-site static scales reproduce the dynamic path
    on calibration-like data, the "a_s" leaves land at every conv site, and
    float serving with calibrated params is unchanged."""
    import nsc_tpu
    from nsc_tpu.models.codec import NeuralSpeechCodec
    from nsc_tpu.ops import quant as Q

    bundle = nsc_tpu.load_model("tiny_test")
    rng = np.random.RandomState(0)
    cal = [rng.randn(2, 512).astype(np.float32) * 0.1 for _ in range(2)]
    qb = nsc_tpu.quantize_model(bundle, cal)
    assert qb.cfg.quant == "int8"
    n_sites = sum(1 for _ in Q._conv_sites(qb.params))
    n_scales = sum(
        1 for p in Q._conv_sites(qb.params) if "a_s" in p
    )
    assert n_scales == n_sites > 0

    wav = jnp.asarray(cal[0])
    dyn_model = NeuralSpeechCodec(qb.cfg)
    idx_dyn = np.asarray(dyn_model.encode(bundle.params, bundle.rvq, wav))
    idx_sta = np.asarray(qb.model.encode(qb.params, qb.rvq, wav))
    agree = (idx_dyn == idx_sta).mean()
    assert agree > 0.9, f"static-vs-dynamic agreement {agree}"

    # calibrated params stay valid on the float path (extra leaves ignored)
    idx_f0 = np.asarray(bundle.model.encode(bundle.params, bundle.rvq, wav))
    idx_f1 = np.asarray(bundle.model.encode(qb.params, bundle.rvq, wav))
    np.testing.assert_array_equal(idx_f0, idx_f1)


def test_int8_static_default_calibration_runs():
    import nsc_tpu

    bundle = nsc_tpu.load_model("tiny_test")
    qb = nsc_tpu.quantize_model(bundle, seconds=0.25)
    wav = np.zeros(bundle.cfg.hop * 16, np.float32)
    idx = nsc_tpu.encode(qb, wav)
    assert idx.shape == (16, bundle.cfg.num_quantizers)


def test_calibrated_checkpoint_roundtrip(tmp_path):
    """Params with injected 'a_s' leaves survive an orbax save -> load_model
    cycle (restore falls back to a structure-free restore when the stored
    tree has leaves the fresh template lacks)."""
    import nsc_tpu
    from nsc_tpu.train import checkpoint as ckpt

    bundle = nsc_tpu.load_model("tiny_test")
    qb = nsc_tpu.quantize_model(
        bundle, [np.zeros((1, 64), np.float32)]
    )
    ckpt.save_inference(str(tmp_path), 1, qb.params, qb.rvq)
    b2 = nsc_tpu.load_model("tiny_test", checkpoint=str(tmp_path))
    idx = nsc_tpu.encode(b2, np.zeros(64, np.float32))
    assert idx.shape == (16, 2)


def test_int8_per_channel_calibration_option():
    """per_channel=True (activation scales folded into weights) stays a
    working option; measured WORSE than per-tensor on the trained
    checkpoint (see ops/quant.py docstring), so per-tensor is the default."""
    import nsc_tpu
    from nsc_tpu.ops import quant as Q

    bundle = nsc_tpu.load_model("tiny_test")
    rng = np.random.RandomState(0)
    cal = [rng.randn(2, 512).astype(np.float32) * 0.1 for _ in range(2)]
    qb = nsc_tpu.quantize_model(bundle, cal, per_channel=True)
    for p in Q._conv_sites(qb.params):
        assert p["a_s"].ndim == 1  # per-channel vectors
    wav = jnp.asarray(cal[0])
    idx_f = np.asarray(bundle.model.encode(bundle.params, bundle.rvq, wav))
    idx_q = np.asarray(qb.model.encode(qb.params, qb.rvq, wav))
    assert (idx_f == idx_q).mean() > 0.5  # random-init tiny model: sanity
