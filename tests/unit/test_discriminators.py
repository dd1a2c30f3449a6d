import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.models import discriminators as D
from nsc_tpu.losses import gan


def _params():
    return D.init_discriminators(jax.random.PRNGKey(0), width_mult=1 / 16)


def test_output_structure():
    p = _params()
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 2048)) * 0.1
    outs = D.apply_discriminators(p, wav)
    assert len(outs) == len(D.PERIODS) + D.MSD_SCALES
    for logits, feats in outs:
        assert logits.shape[0] == 2
        assert len(feats) >= 4
        assert all(np.all(np.isfinite(np.asarray(f))) for f in feats)


def test_period_reshape_handles_nondivisible_length():
    p = _params()
    wav = jnp.zeros((1, 1001))  # not divisible by 7, 11...
    outs = D.apply_discriminators(p, wav)
    assert all(np.all(np.isfinite(np.asarray(lg))) for lg, _ in outs)


def test_gan_losses_behave():
    p = _params()
    key = jax.random.PRNGKey(2)
    real_wav = jax.random.normal(key, (2, 2048)) * 0.1
    fake_wav = jax.random.normal(jax.random.PRNGKey(3), (2, 2048)) * 0.1
    real = D.apply_discriminators(p, real_wav)
    fake = D.apply_discriminators(p, fake_wav)
    d = gan.discriminator_loss(real, fake)
    g = gan.generator_adversarial_loss(fake)
    fm = gan.feature_matching_loss(real, fake)
    assert float(d) > 0 and float(g) > 0 and float(fm) > 0
    # identical inputs -> fm == 0
    fm0 = gan.feature_matching_loss(real, real)
    assert float(fm0) < 1e-6


def test_discriminator_gradients_flow():
    p = _params()
    wav = jax.random.normal(jax.random.PRNGKey(4), (1, 1024)) * 0.1

    def loss(params):
        outs = D.apply_discriminators(params, wav)
        return sum(jnp.mean(jnp.square(lg)) for lg, _ in outs)

    g = jax.grad(loss)(p)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_width_mult_variants_all_apply():
    wav = jnp.zeros((1, 512))
    for mult in (1 / 32, 1 / 8):  # full width exercised on TPU in bench
        p = D.init_discriminators(jax.random.PRNGKey(0), width_mult=mult)
        outs = D.apply_discriminators(p, wav)
        assert len(outs) == len(D.PERIODS) + D.MSD_SCALES


def test_configurable_ensemble_structure():
    """TrainConfig.mpd_periods/msd_scales shrink the ensemble for
    compile-budgeted checks (the multichip dryrun) without changing the
    full-set default; apply() must reject a periods list that doesn't match
    what the params were built for."""
    import pytest

    p = D.init_discriminators(
        jax.random.PRNGKey(0), width_mult=1 / 16, periods=(2, 3), msd_scales=1
    )
    assert len(p["mpd"]) == 2 and len(p["msd"]) == 1
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 2048)) * 0.1
    outs = D.apply_discriminators(p, wav, periods=(2, 3))
    assert len(outs) == 3
    with pytest.raises(AssertionError):
        D.apply_discriminators(p, wav)  # default 5-period list != params
