import dataclasses

import numpy as np
import pytest

from nsc_tpu import bitstream as B


def _header(frames=100, n_q=4, bits=10):
    return B.BitstreamHeader(
        model_name="base", bits=bits, n_q=n_q,
        sample_rate=16000, hop=320, num_frames=frames, orig_len=frames * 320,
    )


def test_header_roundtrip():
    h = _header()
    blob = h.to_bytes()
    h2, off = B.BitstreamHeader.from_bytes(blob)
    assert h2 == h
    assert off == len(blob)


def test_header_golden_bytes():
    """Pin the wire format: any change to these bytes is a format break."""
    h = B.BitstreamHeader("ab", bits=10, n_q=2, sample_rate=16000,
                          hop=320, num_frames=3, orig_len=960)
    expect = (
        b"NSC1" + bytes([1, 0, 2]) + b"ab"
        + bytes([10, 2, 0]) + (16000).to_bytes(4, "little")
        + (320).to_bytes(2, "little") + (3).to_bytes(4, "little")
        + (960).to_bytes(4, "little")
    )
    assert h.to_bytes() == expect


def test_header_fingerprint_roundtrip_and_golden_bytes():
    """FLAG_FINGERPRINT appends a u32 codebook CRC after orig_len and bumps
    the wire version to 2 so pre-fingerprint readers fail cleanly instead of
    mis-computing the payload offset (format extension, rounds 3-4 —
    deliberate golden update)."""
    h = B.BitstreamHeader("ab", bits=10, n_q=2, sample_rate=16000,
                          hop=320, num_frames=3, orig_len=960,
                          flags=B.FLAG_FINGERPRINT, fingerprint=0xDEADBEEF)
    expect = (
        b"NSC1" + bytes([B.VERSION_FINGERPRINT, B.FLAG_FINGERPRINT, 2]) + b"ab"
        + bytes([10, 2, 0]) + (16000).to_bytes(4, "little")
        + (320).to_bytes(2, "little") + (3).to_bytes(4, "little")
        + (960).to_bytes(4, "little") + (0xDEADBEEF).to_bytes(4, "little")
    )
    assert h.to_bytes() == expect
    h2, off = B.BitstreamHeader.from_bytes(h.to_bytes())
    assert h2 == dataclasses.replace(h, version=B.VERSION_FINGERPRINT)
    assert off == len(expect)
    # truncated mid-fingerprint must raise, not crash
    with pytest.raises(B.BitstreamError):
        B.BitstreamHeader.from_bytes(h.to_bytes()[:-2])


def test_unknown_version_and_flags_rejected():
    """Future format extensions must fail loudly: an unknown version or an
    unknown flag bit raises instead of silently mis-offsetting the payload."""
    blob = bytearray(_header().to_bytes())
    blob[4] = 3  # version byte
    with pytest.raises(B.BitstreamError, match="version"):
        B.BitstreamHeader.from_bytes(bytes(blob))
    blob = bytearray(_header().to_bytes())
    blob[5] |= 0x80  # unknown flag bit
    with pytest.raises(B.BitstreamError, match="flags"):
        B.BitstreamHeader.from_bytes(bytes(blob))


def test_plane_pack_unpack_exact():
    rng = np.random.RandomState(0)
    for bits in (1, 4, 8, 10, 12, 16):
        vals = rng.randint(0, 2**bits, size=999).astype(np.int32)
        packed = B.pack_plane(vals, bits)
        assert len(packed) == B.plane_nbytes(999, bits)
        back = B.unpack_plane(packed, 999, bits)
        np.testing.assert_array_equal(back, vals)


def test_frames_roundtrip_and_serialize():
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 1024, size=(100, 4)).astype(np.int32)
    h = _header(frames=100, n_q=4, bits=10)
    blob = B.serialize(h, idx)
    h2, idx2 = B.deserialize(blob)
    assert h2 == h
    np.testing.assert_array_equal(idx2, idx)


def test_truncation_drops_fine_planes():
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 1024, size=(50, 8)).astype(np.int32)
    blob = B.serialize(_header(50, 8), idx)
    short = B.truncate(blob, 3)
    assert len(short) < len(blob)
    h, idx2 = B.deserialize(short)
    assert h.n_q == 3
    np.testing.assert_array_equal(idx2, idx[:, :3])


def test_raw_byte_truncation_also_decodes():
    """Even without rewriting the header, chopping trailing plane bytes
    yields a decodable stream with fewer books (byte-level scalability)."""
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 1024, size=(50, 8)).astype(np.int32)
    blob = B.serialize(_header(50, 8), idx)
    per = B.plane_nbytes(50, 10)
    chopped = blob[: len(blob) - 5 * per]  # drop last 5 planes mid-stream
    _, idx2 = B.deserialize(chopped)
    np.testing.assert_array_equal(idx2, idx[:, :3])


def test_bad_inputs():
    with pytest.raises(B.BitstreamError):
        B.BitstreamHeader.from_bytes(b"XXXX" + bytes(20))
    with pytest.raises(B.BitstreamError):
        B.pack_plane(np.array([1024]), 10)  # exceeds bit width
    with pytest.raises(B.BitstreamError):
        B.deserialize(_header(10, 2).to_bytes())  # no payload at all


def test_truncate_rejects_incomplete_payload():
    """truncate() must bounds-check: a blob already chopped mid-plane cannot
    be re-truncated to more planes than it actually holds."""
    rng = np.random.RandomState(4)
    idx = rng.randint(0, 1024, size=(50, 8)).astype(np.int32)
    blob = B.serialize(_header(50, 8), idx)
    per = B.plane_nbytes(50, 10)
    chopped = blob[: len(blob) - 5 * per - 3]  # 2 complete planes + partial
    with pytest.raises(B.BitstreamError):
        B.truncate(chopped, 4)
    ok = B.truncate(chopped, 2)  # the complete prefix still truncates fine
    _, idx2 = B.deserialize(ok)
    np.testing.assert_array_equal(idx2, idx[:, :2])


def test_truncate_rejects_incomplete_entropy_payload():
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 256, size=(100, 4)).astype(np.int32)
    h = B.BitstreamHeader("base", 8, 4, 16000, 320, 100, 32000,
                          flags=B.FLAG_ENTROPY)
    blob = B.serialize(h, idx)
    chopped = blob[:-3]  # final plane now incomplete
    with pytest.raises(B.BitstreamError):
        B.truncate(chopped, 4)
    ok = B.truncate(chopped, 2)
    _, idx2 = B.deserialize(ok)
    np.testing.assert_array_equal(idx2, idx[:, :2])


def test_fuzz_corrupt_streams_never_crash():
    """Robustness: deserialize/truncate on corrupted, truncated, or random
    blobs must raise BitstreamError/ValueError — never crash, hang, or
    silently return malformed planes (SURVEY.md §3 #8 hardening)."""
    import numpy as np

    from nsc_tpu import bitstream as B

    rng = np.random.RandomState(0)
    idx = rng.randint(0, 255, size=(50, 4)).astype(np.int32)
    header = B.BitstreamHeader(
        model_name="small", bits=8, n_q=4, sample_rate=16000, hop=320,
        num_frames=50, orig_len=16000, flags=0,
    )
    blob = B.serialize(header, idx)

    for trial in range(300):
        kind = trial % 3
        if kind == 0:  # truncate at a random point
            bad = blob[: rng.randint(0, len(blob))]
        elif kind == 1:  # flip random bytes
            arr = bytearray(blob)
            for _ in range(rng.randint(1, 8)):
                arr[rng.randint(len(arr))] = rng.randint(256)
            bad = bytes(arr)
        else:  # pure noise with a valid-looking length
            bad = rng.bytes(rng.randint(1, len(blob)))
        try:
            h, got = B.deserialize(bad)
            # if it parsed, the result must at least be structurally sound
            assert got.ndim == 2 and got.shape[0] == h.num_frames
        except (B.BitstreamError, ValueError):
            pass
        try:
            B.truncate(bad, 2)
        except (B.BitstreamError, ValueError):
            pass


def test_fuzz_corrupt_entropy_streams_never_crash():
    import numpy as np

    from nsc_tpu import bitstream as B

    rng = np.random.RandomState(1)
    idx = rng.randint(0, 255, size=(50, 2)).astype(np.int32)
    header = B.BitstreamHeader(
        model_name="small", bits=8, n_q=2, sample_rate=16000, hop=320,
        num_frames=50, orig_len=16000, flags=B.FLAG_ENTROPY,
    )
    blob = B.serialize(header, idx)
    ok = B.deserialize(blob)[1]
    assert np.array_equal(ok, idx)
    for trial in range(150):
        if trial % 2 == 0:
            bad = blob[: rng.randint(0, len(blob))]
        else:
            arr = bytearray(blob)
            arr[rng.randint(len(arr))] = rng.randint(256)
            bad = bytes(arr)
        try:
            h, got = B.deserialize(bad)
            assert got.ndim == 2 and got.shape[0] == h.num_frames
        except (B.BitstreamError, ValueError):
            pass
