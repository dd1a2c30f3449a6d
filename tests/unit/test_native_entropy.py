"""Native C arithmetic coder (native/entropy.c) vs the Python specification
(nsc_tpu/entropy.py): byte-identical output, cross-decodable both ways,
including the count-rescale path. The Python path stays tested by forcing
the native loader to report unavailable."""

import numpy as np
import pytest

from nsc_tpu import entropy as E
from nsc_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _python_encode(syms, k):
    """Force the pure-Python path regardless of native availability."""
    import unittest.mock as mock

    with mock.patch.object(native, "ac_encode_plane", return_value=None):
        return E.encode_plane(syms, k)


def _python_decode(data, n, k):
    import unittest.mock as mock

    with mock.patch.object(native, "ac_decode_plane", return_value=None):
        return E.decode_plane(data, n, k)


@pytest.mark.parametrize("k", [16, 256, 1024])
def test_native_bytes_identical_to_python(k):
    rng = np.random.RandomState(k)
    for syms in (
        rng.randint(0, k, 777).astype(np.int32),                 # uniform
        np.minimum(rng.zipf(1.4, 1500) - 1, k - 1).astype(np.int32),  # skewed
        np.zeros(300, np.int32),                                 # degenerate
        np.arange(min(k, 200), dtype=np.int32) % k,              # cycling
        np.zeros(0, np.int32),                                   # empty
    ):
        c_native = E.encode_plane(syms, k)     # native path (available)
        c_python = _python_encode(syms, k)
        assert c_native == c_python, f"byte mismatch k={k} n={syms.size}"
        # cross-decode both ways
        np.testing.assert_array_equal(
            E.decode_plane(c_python, syms.size, k), syms
        )
        np.testing.assert_array_equal(
            _python_decode(c_native, syms.size, k), syms
        )


def test_native_rescale_path_identical(monkeypatch):
    monkeypatch.setattr(E, "RESCALE_AT", 4096)
    rng = np.random.RandomState(9)
    syms = np.minimum(rng.zipf(1.3, 3000) - 1, 63).astype(np.int32)
    c_native = E.encode_plane(syms, 64)
    c_python = _python_encode(syms, 64)
    assert c_native == c_python
    np.testing.assert_array_equal(E.decode_plane(c_native, 3000, 64), syms)


def test_native_is_much_faster():
    """Not a strict perf assertion — just records that the native coder is
    the fast path (the Python loop does ~1e5 symbols/s)."""
    import time

    rng = np.random.RandomState(1)
    syms = rng.randint(0, 1024, 50_000).astype(np.int32)
    t0 = time.perf_counter()
    coded = E.encode_plane(syms, 1024)
    dt = time.perf_counter() - t0
    rate = syms.size / dt
    assert rate > 5e5, f"native coder unexpectedly slow: {rate:.0f} sym/s"
    np.testing.assert_array_equal(E.decode_plane(coded, syms.size, 1024), syms)
