import numpy as np
import pytest

from nsc_tpu import bitstream as B
from nsc_tpu import entropy as E


def test_plane_roundtrip_uniform():
    rng = np.random.RandomState(0)
    syms = rng.randint(0, 1024, 500).astype(np.int32)
    coded = E.encode_plane(syms, 1024)
    back = E.decode_plane(coded, 500, 1024)
    np.testing.assert_array_equal(back, syms)


def test_plane_roundtrip_skewed_and_compresses():
    rng = np.random.RandomState(1)
    # zipf-ish skew typical of a trained codebook
    syms = np.minimum(rng.zipf(1.5, 2000) - 1, 255).astype(np.int32)
    coded = E.encode_plane(syms, 256)
    back = E.decode_plane(coded, 2000, 256)
    np.testing.assert_array_equal(back, syms)
    raw_bytes = (2000 * 8 + 7) // 8
    assert len(coded) < 0.8 * raw_bytes, (len(coded), raw_bytes)


def test_plane_edge_cases():
    for syms in ([], [0], [15] * 100, list(range(16))):
        arr = np.asarray(syms, np.int32)
        coded = E.encode_plane(arr, 16)
        back = E.decode_plane(coded, len(arr), 16)
        np.testing.assert_array_equal(back, arr)
    with pytest.raises(ValueError):
        E.encode_plane(np.asarray([16]), 16)


def test_frames_roundtrip_and_truncation():
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 64, size=(300, 6)).astype(np.int32)
    payload = E.encode_frames(idx, 64)
    back = E.decode_frames(payload, 300, 6, 64)
    np.testing.assert_array_equal(back, idx)
    assert E.count_planes(payload, 6) == 6
    # chop mid-plane: only complete planes decode
    chopped = payload[: len(payload) - 3]
    assert E.count_planes(chopped, 6) == 5


def test_bitstream_entropy_flag_roundtrip():
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 1024, size=(200, 4)).astype(np.int32)
    h = B.BitstreamHeader("base", 10, 4, 16000, 320, 200, 64000,
                          flags=B.FLAG_ENTROPY)
    blob = B.serialize(h, idx)
    h2, idx2 = B.deserialize(blob)
    assert h2.flags & B.FLAG_ENTROPY
    np.testing.assert_array_equal(idx2, idx)
    # truncation works on entropy streams too
    short = B.truncate(blob, 2)
    h3, idx3 = B.deserialize(short)
    assert h3.n_q == 2
    np.testing.assert_array_equal(idx3, idx[:, :2])


def test_api_compress_entropy(tmp_path):
    import nsc_tpu

    bundle = nsc_tpu.load_model("tiny_test")
    wav = (np.random.RandomState(0).randn(4000) * 0.1).astype(np.float32)
    blob_raw = nsc_tpu.compress(bundle, wav)
    blob_ent = nsc_tpu.compress(bundle, wav, entropy_coding=True)
    out_raw = nsc_tpu.decompress(bundle, blob_raw)
    out_ent = nsc_tpu.decompress(bundle, blob_ent)
    np.testing.assert_allclose(out_raw, out_ent, atol=1e-7)


def test_adaptive_model_count_rescaling(monkeypatch):
    """Unbounded count growth would break the coder's total<=span invariant
    on very long planes; counts are halved at RESCALE_AT. Force a tiny
    threshold so the rescale path triggers many times and encode/decode stay
    in lockstep."""
    monkeypatch.setattr(E, "RESCALE_AT", 4096)
    rng = np.random.RandomState(6)
    syms = np.minimum(rng.zipf(1.3, 3000) - 1, 63).astype(np.int32)
    coded = E.encode_plane(syms, 64)
    back = E.decode_plane(coded, 3000, 64)
    np.testing.assert_array_equal(back, syms)


def test_adaptive_model_total_stays_bounded(monkeypatch):
    monkeypatch.setattr(E, "RESCALE_AT", 4096)
    m = E._AdaptiveModel(64)
    for i in range(2000):
        m.update(i % 64)
    assert m.total <= 4096 + 32 * E.REBUILD + 64


def test_entropy_raw_fallback():
    """compress(entropy_coding=True) must never EXPAND the stream: on
    near-uniform index planes the adaptive coder's output exceeds
    fixed-width packing, and api._finalize_stream falls back to the raw
    serialization (flag cleared in the header, so decompress auto-detects —
    the post-refit-codebook case, docs/refit_report.json)."""
    import nsc_tpu
    from nsc_tpu import api as A, bitstream as B

    bundle = nsc_tpu.load_model("tiny_test")
    rng = np.random.RandomState(3)
    F, n_q = 40, bundle.cfg.num_quantizers
    # worst case for the coder: exactly-uniform random planes
    idx = rng.randint(0, 1 << bundle.cfg.bits_per_codebook, size=(F, n_q))
    idx = idx.astype(np.int32)
    blob = A._finalize_stream(bundle, idx, F * bundle.cfg.hop, True)
    raw = A._finalize_stream(bundle, idx, F * bundle.cfg.hop, False)
    assert len(blob) <= len(raw)
    h, back = B.deserialize(blob)
    np.testing.assert_array_equal(back, idx)
    # and when coding DOES help (long constant planes — enough frames to
    # amortize the coder's per-plane framing), the flag must survive
    F0 = 2000
    idx0 = np.zeros((F0, n_q), dtype=np.int32)
    blob0 = A._finalize_stream(bundle, idx0, F0 * bundle.cfg.hop, True)
    h0, _ = B.deserialize(blob0)
    assert h0.flags & B.FLAG_ENTROPY
    assert len(blob0) < len(A._finalize_stream(bundle, idx0, F0 * bundle.cfg.hop, False))
