"""Streaming == batch equality (BASELINE.json:8; SURVEY.md §5 integration
tests: "streaming-vs-batch encode equality (same indices for same audio — the
key streaming correctness property)")."""

import jax
import numpy as np
import pytest

import nsc_tpu
from nsc_tpu import streaming
from nsc_tpu.models import seanet
from nsc_tpu.ops import rvq as rvq_ops

import jax.numpy as jnp


@pytest.fixture(scope="module")
def bundle():
    return nsc_tpu.load_model("tiny_test")


@pytest.fixture(scope="module")
def wav(bundle):
    rng = np.random.RandomState(0)
    t = 64 * bundle.cfg.hop
    return (rng.randn(t) * 0.2).astype(np.float32)


def test_streaming_encoder_latents_match_batch(bundle, wav):
    cfg = bundle.cfg
    x = jnp.asarray(wav)[None, :, None]
    z_batch = seanet.apply_encoder(bundle.params["encoder"], x, cfg)

    state = streaming.encoder_init_state(bundle.params["encoder"], cfg, 1)
    chunks = np.split(wav, 4)
    zs = []
    for c in chunks:
        z, state = streaming.encoder_stream(
            bundle.params["encoder"], state, jnp.asarray(c)[None, :, None], cfg
        )
        zs.append(np.asarray(z))
    z_stream = np.concatenate(zs, axis=1)
    np.testing.assert_allclose(z_stream, np.asarray(z_batch), rtol=1e-4, atol=1e-5)


def test_streaming_indices_identical_to_batch(bundle, wav):
    batch_idx = nsc_tpu.encode(bundle, wav)
    enc = streaming.StreamingEncoder(bundle.model, bundle.params, bundle.rvq)
    got = []
    for c in np.split(wav, 8):
        got.append(enc.push(c))
    stream_idx = np.concatenate(got, axis=0)
    np.testing.assert_array_equal(stream_idx, batch_idx)


def test_streaming_uneven_chunks(bundle, wav):
    """Chunks of different (hop-multiple) sizes still match batch."""
    cfg = bundle.cfg
    batch_idx = nsc_tpu.encode(bundle, wav)
    enc = streaming.StreamingEncoder(bundle.model, bundle.params, bundle.rvq)
    splits = [4 * cfg.hop, 20 * cfg.hop, 40 * cfg.hop]
    got, start = [], 0
    for end in splits + [len(wav)]:
        got.append(enc.push(wav[start:end]))
        start = end
    stream_idx = np.concatenate(got, axis=0)
    np.testing.assert_array_equal(stream_idx, batch_idx)


def test_streaming_rejects_non_hop_chunk(bundle):
    enc = streaming.StreamingEncoder(bundle.model, bundle.params, bundle.rvq)
    with pytest.raises(ValueError, match="multiple of hop"):
        enc.push(np.zeros(bundle.cfg.hop + 1, np.float32))


def test_streaming_decoder_matches_batch(bundle, wav):
    idx = nsc_tpu.encode(bundle, wav)
    batch_wav = nsc_tpu.decode(bundle, idx)
    dec = streaming.StreamingDecoder(bundle.model, bundle.params, bundle.rvq)
    outs = [dec.push(part) for part in np.split(idx, 4, axis=0)]
    stream_wav = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(stream_wav, batch_wav, rtol=1e-4, atol=1e-5)


def test_full_streaming_pipeline(bundle, wav):
    """encode chunks -> decode chunks == batch reconstruct."""
    ref = nsc_tpu.decode(bundle, nsc_tpu.encode(bundle, wav))
    enc = streaming.StreamingEncoder(bundle.model, bundle.params, bundle.rvq)
    dec = streaming.StreamingDecoder(bundle.model, bundle.params, bundle.rvq)
    out = []
    for c in np.split(wav, 8):
        out.append(dec.push(enc.push(c)))
    got = np.concatenate(out, axis=0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_push_many_matches_sequential_pushes():
    """push_many(k chunks) must equal k sequential push() calls bit-exactly
    (it IS one concatenated push under the streaming==batch contract), and
    the decoder side must round-trip the same blocks."""
    import numpy as np

    from nsc_tpu import streaming
    from nsc_tpu.configs import get_config
    from nsc_tpu.models.codec import init_codec

    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    chunks = [
        (rng.randn(2, n * cfg.hop) * 0.1).astype(np.float32) for n in (3, 1, 2)
    ]

    enc_seq = streaming.StreamingEncoder(model, params, rvq)
    seq = [enc_seq.push(c) for c in chunks]
    enc_many = streaming.StreamingEncoder(model, params, rvq)
    many = enc_many.push_many(chunks)
    assert len(many) == len(seq)
    for a, b in zip(many, seq):
        np.testing.assert_array_equal(a, b)

    dec_seq = streaming.StreamingDecoder(model, params, rvq)
    wav_seq = [dec_seq.push(i) for i in seq]
    dec_many = streaming.StreamingDecoder(model, params, rvq)
    wav_many = dec_many.push_many(seq)
    for a, b in zip(wav_many, wav_seq):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_streaming_batched(bundle):
    rng = np.random.RandomState(1)
    wavs = (rng.randn(3, 32 * bundle.cfg.hop) * 0.2).astype(np.float32)
    batch_idx = nsc_tpu.encode(bundle, wavs)
    enc = streaming.StreamingEncoder(bundle.model, bundle.params, bundle.rvq)
    got = np.concatenate(
        [enc.push(c) for c in np.split(wavs, 2, axis=1)], axis=1
    )
    np.testing.assert_array_equal(got, batch_idx)


def test_streaming_compress_byte_identical_to_batch(bundle, wav):
    """api.streaming_compress produces the SAME bitstream bytes as batch
    compress (indices bit-identical + identical header)."""
    a = nsc_tpu.compress(bundle, wav)
    secs = 16 * bundle.cfg.hop / bundle.cfg.sample_rate  # 4 chunks
    b = nsc_tpu.streaming_compress(bundle, wav, chunk_seconds=secs)
    assert a == b


def test_streaming_decompress_matches_batch(bundle, wav):
    blob = nsc_tpu.compress(bundle, wav)
    ref = nsc_tpu.decompress(bundle, blob)
    # chunk = 24 frames: the 64-frame stream decodes as 2 full chunks plus a
    # PARTIAL last one (pad+trim path)
    secs = 24 * bundle.cfg.hop / bundle.cfg.sample_rate
    got = nsc_tpu.streaming_decompress(bundle, blob, chunk_seconds=secs)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # identity checks still apply on the streaming path
    other = nsc_tpu.load_model(bundle.cfg.name, seed=99)
    from nsc_tpu.bitstream import BitstreamError

    with pytest.raises(BitstreamError, match="fingerprint"):
        nsc_tpu.streaming_decompress(other, blob)


def test_queue_chunks_byte_identical(bundle, wav):
    """The public streaming API's queued default (queue_chunks=4, r5) must be
    byte-identical to strict chunk-at-a-time (queue_chunks=1): the carried
    conv state evolves identically, only dispatch granularity differs
    (VERDICT r4 #6)."""
    secs = 16 * bundle.cfg.hop / bundle.cfg.sample_rate  # 4 chunks
    one = nsc_tpu.streaming_compress(bundle, wav, chunk_seconds=secs,
                                     queue_chunks=1)
    four = nsc_tpu.streaming_compress(bundle, wav, chunk_seconds=secs,
                                      queue_chunks=4)
    assert one == four
    # decode side: queued and chunk-at-a-time produce identical waveforms,
    # including through a partial (pad+trim) final chunk
    dsecs = 24 * bundle.cfg.hop / bundle.cfg.sample_rate
    w1 = nsc_tpu.streaming_decompress(bundle, one, chunk_seconds=dsecs,
                                      queue_chunks=1)
    w4 = nsc_tpu.streaming_decompress(bundle, one, chunk_seconds=dsecs,
                                      queue_chunks=4)
    np.testing.assert_array_equal(w1, w4)


def test_push_many_rejects_unaligned_interior_chunk():
    """push_many must enforce per-chunk hop alignment exactly as sequential
    push()es would: only the concatenated total hits push's own check, and
    an unaligned interior chunk silently shifts every later chunk's frame
    slice and drops frames (r4 review)."""
    from nsc_tpu.configs import get_config
    from nsc_tpu.models.codec import init_codec

    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    enc = streaming.StreamingEncoder(model, params, rvq)
    hop = cfg.hop
    rng = np.random.RandomState(0)
    # total 2*hop is aligned; the first chunk alone is not
    chunks = [
        rng.randn(2, hop + hop // 2).astype(np.float32),
        rng.randn(2, hop // 2).astype(np.float32),
    ]
    with pytest.raises(ValueError, match="not a multiple of hop"):
        enc.push_many(chunks)
