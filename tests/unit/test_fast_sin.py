import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.ops.conv import fast_sin, init_snake, snake, snake_fast


def test_fast_sin_accuracy():
    t = jnp.asarray(np.linspace(-100, 100, 400_001, dtype=np.float32))
    err = np.abs(np.asarray(fast_sin(t)) - np.sin(np.asarray(t, np.float64)))
    assert err.max() < 1e-5


def test_fast_sin_special_points():
    pts = np.array([0.0, np.pi / 2, np.pi, -np.pi / 2, 3 * np.pi], np.float32)
    got = np.asarray(fast_sin(jnp.asarray(pts)))
    np.testing.assert_allclose(got, np.sin(pts.astype(np.float64)), atol=1e-5)


def test_snake_fast_matches_snake():
    p = init_snake(8)
    x = jnp.asarray(np.random.RandomState(0).randn(500, 8).astype(np.float32) * 10)
    a = np.asarray(snake(x, p))
    b = np.asarray(snake_fast(x, p))
    # deg-3 minimax sin^2: 8.1e-5 abs bound (still ~100x under bf16 ulp)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_snake_fast_gradient_finite():
    p = init_snake(4)
    x = jnp.asarray(np.random.RandomState(1).randn(64, 4).astype(np.float32))
    g = jax.grad(lambda xx: jnp.sum(snake_fast(xx, p)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient close to exact snake's (the derivative of a minimax VALUE fit
    # deviates ~sqrt(value-bound): deg-3 value err 8e-5 -> grad err ~3e-3;
    # snake_fast is a serving-path activation, training uses exact snake)
    ge = jax.grad(lambda xx: jnp.sum(snake(xx, p)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ge), atol=5e-3)
