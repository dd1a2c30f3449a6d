import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.losses import spectral
from nsc_tpu.utils.profiling import Stopwatch, timed


def _sig(seed, n=4096):
    return jax.random.normal(jax.random.PRNGKey(seed), (2, n)) * 0.3


def test_stft_loss_zero_on_identity():
    x = _sig(0)
    cfg = spectral.MultiResSTFTConfig(fft_sizes=(256, 128))
    assert float(spectral.multi_res_stft_loss(x, x, cfg)) < 1e-5


def test_stft_loss_orders_degradations():
    x = _sig(1)
    cfg = spectral.MultiResSTFTConfig(fft_sizes=(256, 128))
    mild = x + 0.01 * _sig(2)
    severe = x + 0.3 * _sig(3)
    l_mild = float(spectral.multi_res_stft_loss(mild, x, cfg))
    l_severe = float(spectral.multi_res_stft_loss(severe, x, cfg))
    assert 0 < l_mild < l_severe


def test_mel_and_time_losses_differentiable():
    x = _sig(4, 2048)
    y = _sig(5, 2048)

    def total(p):
        return (
            spectral.mel_loss(p, y, n_fft=256, hop=64, n_mels=20)
            + spectral.time_l1_loss(p, y)
        )

    g = jax.grad(total)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_stopwatch_and_timed():
    sw = Stopwatch()
    with sw("block"):
        sum(range(1000))
    rep = sw.report()
    assert "time/block_ms" in rep and rep["time/block_ms"] >= 0
    res = {}
    with timed("x", res):
        pass
    assert "x" in res
