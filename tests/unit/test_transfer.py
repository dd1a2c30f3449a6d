"""bundled_device_get: one-transfer pytree pull == per-leaf device_get."""

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.utils.transfer import bundled_device_get


def test_bundled_get_matches_per_leaf():
    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": [jnp.ones((2, 3), jnp.bfloat16) * 1.5, jnp.array(7, jnp.int32)],
        "c": jnp.array([True, False, True]),
        "rng": jax.random.PRNGKey(3),
        "k8": jnp.arange(5, dtype=jnp.uint8),
        "scalar": jnp.float32(2.5),
    }
    got = bundled_device_get(tree)
    ref = jax.tree.map(np.asarray, tree)
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        g, r = np.asarray(g), np.asarray(r)
        assert g.dtype == r.dtype and g.shape == r.shape
        np.testing.assert_array_equal(g, r)


def test_bundled_get_typed_prng_keys():
    tree = {"k": jax.random.key(0), "x": jnp.zeros((2,))}
    got = bundled_device_get(tree)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(got["k"])),
        np.asarray(jax.random.key_data(tree["k"])),
    )


def test_bundled_get_empty_and_roundtrip_train_state():
    assert bundled_device_get({}) == {}
    # a real (tiny) train state pulls correctly
    from nsc_tpu.configs import TrainConfig, get_config
    from nsc_tpu.train.train import init_train_state

    cfg = get_config("tiny_test")
    tcfg = TrainConfig(
        batch_size=2, segment_seconds=0.032, use_gan=False,
        stft_fft_sizes=(64,), mel_fft_size=64, mel_bins=8,
    )
    _, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    got = bundled_device_get(state)
    ref = jax.tree.map(np.asarray, state)
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
