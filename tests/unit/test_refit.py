"""Offline codebook refit (nsc_tpu/train/refit.py; VERDICT r3 #4).

The refit contract: sequential residual k-means on a latent pool must
(a) raise codebook utilization and (b) lower the quantization error at every
depth, relative to codebooks that do not tile the pool's distribution."""

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu import api
from nsc_tpu.train import refit


def _clustered_pool(m: int = 2048, d: int = 8, clusters: int = 24, seed: int = 0):
    """A pool with clear cluster structure the refit should discover."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(clusters, d).astype(np.float32) * 3.0
    assign = rng.randint(0, clusters, size=m)
    return jnp.asarray(
        centers[assign] + 0.1 * rng.randn(m, d).astype(np.float32)
    )


def test_refit_improves_usage_and_residual_mse():
    bundle = api.load_model("tiny_test", seed=0)
    pool = _clustered_pool(d=bundle.cfg.codebook_dim)

    before = refit.pool_report(bundle.rvq, pool)
    rvq2 = refit.refit_codebooks(
        jax.random.PRNGKey(1), bundle.rvq, pool, kmeans_iters=6
    )
    after = refit.pool_report(rvq2, pool)

    assert after["mean_usage"] >= before["mean_usage"]
    assert after["mean_usage"] >= 0.9  # every code seeded at a data point
    for b, a in zip(
        before["residual_mse_per_depth"], after["residual_mse_per_depth"]
    ):
        assert a < b  # strictly better at every depth
    # refit state is a complete, consistent RVQState (EMA stats included)
    assert set(rvq2) == {"codebooks", "ema_count", "ema_sum"}
    assert rvq2["codebooks"].shape == bundle.rvq["codebooks"].shape
    assert bool(jnp.all(rvq2["ema_count"] > 0))


def test_collect_latents_shape_and_pooling():
    bundle = api.load_model("tiny_test", seed=0)
    cfg = bundle.cfg
    seg = 8 * cfg.hop
    batches = iter(
        [np.random.RandomState(i).randn(2, seg).astype(np.float32) * 0.1
         for i in range(3)]
    )
    pool = refit.collect_latents(bundle, batches, 3)
    assert pool.shape == (3 * 2 * 8, cfg.codebook_dim)
    assert pool.dtype == jnp.float32
