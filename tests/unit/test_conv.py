import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsc_tpu.ops import conv as C


def _np_causal_conv(x, w, b, stride=1, dilation=1):
    """Reference: direct numpy causal conv. x (T, Cin), w (K, Cin, Cout)."""
    k, cin, cout = w.shape
    eff = (k - 1) * dilation
    xp = np.pad(x, ((eff, 0), (0, 0)))
    t_out = (x.shape[0] - 1) // stride + 1
    y = np.zeros((t_out, cout), np.float64)
    for t in range(t_out):
        for tap in range(k):
            y[t] += xp[t * stride + tap * dilation] @ w[tap]
    return y + b


@pytest.mark.parametrize("stride,dilation", [(1, 1), (1, 3), (2, 1), (4, 1), (1, 9)])
def test_causal_conv_matches_numpy(stride, dilation):
    rng = np.random.RandomState(0)
    x = rng.randn(1, 37, 3).astype(np.float32)
    key = jax.random.PRNGKey(0)
    p = C.init_conv(key, kernel=5, in_ch=3, out_ch=4, weight_norm=False)
    y = C.conv1d(jnp.asarray(x), p, stride=stride, dilation=dilation)
    ref = _np_causal_conv(x[0], np.asarray(p["w"]), np.asarray(p["b"]), stride, dilation)
    np.testing.assert_allclose(np.asarray(y[0]), ref, rtol=1e-4, atol=1e-5)


def test_causality():
    """Output at frame t must not change when future inputs change."""
    key = jax.random.PRNGKey(1)
    p = C.init_conv(key, kernel=7, in_ch=2, out_ch=2)
    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 50, 2))
    x2 = x1.at[:, 30:, :].set(99.0)
    y1 = C.conv1d(x1, p, padding="causal")
    y2 = C.conv1d(x2, p, padding="causal")
    np.testing.assert_allclose(np.asarray(y1[:, :30]), np.asarray(y2[:, :30]), atol=1e-6)


def test_weight_norm_equals_plain_at_init():
    key = jax.random.PRNGKey(3)
    p = C.init_conv(key, 5, 3, 4, weight_norm=True)
    w = C.materialize_weight(p)
    np.testing.assert_allclose(np.asarray(w), np.asarray(p["v"]), rtol=1e-5, atol=1e-6)


def test_conv_output_lengths():
    p = C.init_conv(jax.random.PRNGKey(0), 8, 2, 2)
    x = jnp.zeros((1, 64, 2))
    for stride in (1, 2, 4):
        y = C.conv1d(x, p, stride=stride, padding="causal")
        assert y.shape[1] == (64 - 1) // stride + 1


@pytest.mark.parametrize("stride,kernel", [(2, 4), (4, 8), (5, 10), (8, 16)])
def test_conv_transpose_exact_upsample_length(stride, kernel):
    p = C.init_conv(jax.random.PRNGKey(0), kernel, 3, 2)
    x = jnp.ones((2, 17, 3))
    for causal in (True, False):
        y = C.conv_transpose1d(x, p, stride=stride, causal=causal)
        assert y.shape == (2, 17 * stride, 2)


def test_conv_transpose_matches_numpy():
    """VALID conv_transpose == scatter-accumulate; check the causal trim."""
    rng = np.random.RandomState(0)
    k, s, cin, cout, t = 4, 2, 2, 3, 9
    x = rng.randn(1, t, cin).astype(np.float32)
    p = C.init_conv(jax.random.PRNGKey(0), k, cin, cout, weight_norm=False)
    w, b = np.asarray(p["w"]), np.asarray(p["b"])
    full = np.zeros(((t - 1) * s + k, cout), np.float64)
    for i in range(t):
        for tap in range(k):
            full[i * s + tap] += x[0, i] @ w[tap]
    ref = full[: t * s] + b  # causal: trim right (k - s)
    y = C.conv_transpose1d(jnp.asarray(x), p, stride=s, causal=True)
    np.testing.assert_allclose(np.asarray(y[0]), ref, rtol=1e-4, atol=1e-5)


def test_snake_activation():
    p = C.init_snake(3)
    x = jnp.linspace(-2, 2, 30).reshape(1, 10, 3)
    y = C.snake(x, p)
    ref = np.asarray(x) + np.sin(np.asarray(x)) ** 2  # alpha=1
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)
    # gradient flows
    g = jax.grad(lambda a: C.snake(x, {"alpha": a}).sum())(p["alpha"])
    assert np.all(np.isfinite(np.asarray(g)))
