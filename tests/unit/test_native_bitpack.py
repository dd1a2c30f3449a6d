"""Native C bit-packer vs numpy path: byte-identical output required."""

import numpy as np
import pytest

from nsc_tpu import bitstream as B
from nsc_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="no C compiler available"
)


@requires_native
@pytest.mark.parametrize("bits", [1, 4, 8, 10, 16])
def test_native_pack_matches_numpy(bits):
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 2**bits, size=(777, 5)).astype(np.int32)
    native_bytes = native.pack_frames(idx, bits)
    numpy_bytes = b"".join(B.pack_plane(idx[:, q], bits) for q in range(5))
    assert native_bytes == numpy_bytes


@requires_native
@pytest.mark.parametrize("bits", [1, 4, 10, 16])
def test_native_roundtrip(bits):
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 2**bits, size=(333, 3)).astype(np.int32)
    payload = native.pack_frames(idx, bits)
    back = native.unpack_frames(payload, 333, 3, bits)
    np.testing.assert_array_equal(back, idx)


@requires_native
def test_bitstream_layer_uses_native_transparently():
    """serialize/deserialize must be identical regardless of backend."""
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 1024, size=(100, 4)).astype(np.int32)
    h = B.BitstreamHeader("base", 10, 4, 16000, 320, 100, 32000)
    blob = B.serialize(h, idx)
    h2, idx2 = B.deserialize(blob)
    np.testing.assert_array_equal(idx2, idx)
    # numpy reference blob identical
    ref = h.to_bytes() + b"".join(B.pack_plane(idx[:, q], 10) for q in range(4))
    assert blob == ref


def test_overflow_still_raises_with_native():
    with pytest.raises(B.BitstreamError):
        B.pack_frames(np.array([[1024]], np.int32), 10)
    with pytest.raises(B.BitstreamError):
        B.pack_frames(np.array([[-1]], np.int32), 10)
