"""Pallas RVQ kernel vs XLA reference: EXACT index/codeword equality required
(SURVEY.md §5 unit tests: "Pallas kernels vs pure-JAX lowerings (exact match
required)"). On CPU the kernel runs in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsc_tpu.ops import rvq
from nsc_tpu.ops.pallas import rvq_argmin as PK


def _books(n_q=4, k=128, d=32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n_q, k, d), jnp.float32)


def _ref_quantize(books, z2d):
    st = {"codebooks": books}
    return np.asarray(rvq.quantize(st, z2d))


@pytest.mark.parametrize("m,d,k,n_q", [(700, 32, 128, 4), (512, 128, 256, 8), (33, 64, 128, 2)])
def test_quantize_kernel_bit_exact(m, d, k, n_q):
    books = _books(n_q, k, d)
    z = jax.random.normal(jax.random.PRNGKey(1), (m, d), jnp.float32)
    ref = _ref_quantize(books, z)
    got = np.asarray(PK.quantize_pallas(books, z, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_quantize_kernel_tie_break():
    """Duplicate codewords: both paths must pick the lowest index."""
    k, d = 128, 8
    base = jax.random.normal(jax.random.PRNGKey(2), (k, d), jnp.float32)
    books = jnp.stack([base.at[64].set(base[3])])  # 64 duplicates 3
    z = base[3][None, :] + 0.0
    ref = _ref_quantize(books, z)
    got = np.asarray(PK.quantize_pallas(books, z, interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert got[0, 0] == 3  # lowest index wins


def test_dequantize_kernel_exact():
    n_q, k, d, m = 4, 128, 32, 300
    books = _books(n_q, k, d, seed=3)
    idx = jax.random.randint(jax.random.PRNGKey(4), (m, n_q), 0, k)
    st = {"codebooks": books}
    ref = np.asarray(rvq.dequantize(st, idx))
    got = np.asarray(PK.dequantize_pallas(books, idx, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_backend_dispatch_and_fallback():
    # small codebook (K=16) fails pallas_supported -> silently uses XLA
    assert not PK.pallas_supported(2, 16, 8)
    assert PK.pallas_supported(16, 1024, 128)
    st = {"codebooks": _books(2, 128, 16, seed=5)}
    z = jax.random.normal(jax.random.PRNGKey(6), (3, 10, 16))
    a = np.asarray(rvq.quantize(st, z, backend="xla"))
    # on CPU the pallas branch compiles the kernel only on TPU; supported
    # shapes go through interpret only when asked — here just check dispatch
    b = np.asarray(rvq.quantize(st, z, backend="pallas"))
    np.testing.assert_array_equal(a, b)
