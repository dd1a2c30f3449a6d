import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.configs import get_config
from nsc_tpu.ops import rvq


def _state(seed=0, cfg=None):
    cfg = cfg or get_config("tiny_test")
    return cfg, rvq.init_rvq(jax.random.PRNGKey(seed), cfg)


def test_quantize_dequantize_shapes():
    cfg, st = _state()
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 10, cfg.latent_dim))
    idx = rvq.quantize(st, z)
    assert idx.shape == (2, 10, cfg.num_quantizers)
    assert idx.dtype == jnp.int32
    out = rvq.dequantize(st, idx)
    assert out.shape == z.shape


def test_nearest_matches_numpy_bruteforce():
    cfg, st = _state()
    z = np.random.RandomState(0).randn(50, cfg.latent_dim).astype(np.float32)
    cb = np.asarray(st["codebooks"][0])
    ref = np.argmin(((z[:, None, :] - cb[None]) ** 2).sum(-1), axis=1)
    got = np.asarray(rvq._nearest(jnp.asarray(z), st["codebooks"][0]))
    np.testing.assert_array_equal(got, ref)


def test_argmin_tie_breaks_to_lowest_index():
    cb = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    st = {"codebooks": cb[None]}
    idx = rvq._nearest(jnp.asarray([[1.0, 0.0]]), cb)
    assert int(idx[0]) == 0  # codes 0 and 1 tie; lowest wins


def test_rvq_prefix_property():
    """Indices of the first d books are independent of total depth."""
    cfg, st = _state()
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 20, cfg.latent_dim))
    full = rvq.quantize(st, z)
    shallow = rvq.quantize(st, z, n_q=1)
    np.testing.assert_array_equal(np.asarray(full[..., :1]), np.asarray(shallow))


def test_residual_refinement_reduces_error():
    cfg, st = _state()
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 30, cfg.latent_dim))
    idx = rvq.quantize(st, z)
    e1 = float(jnp.mean((z - rvq.dequantize(st, idx, n_q=1)) ** 2))
    e2 = float(jnp.mean((z - rvq.dequantize(st, idx, n_q=2)) ** 2))
    assert e2 < e1


def test_forward_matches_quantize_and_ste_gradient():
    cfg, st = _state()
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 15, cfg.latent_dim))
    fwd = rvq.forward(st, z)
    np.testing.assert_array_equal(np.asarray(fwd.indices), np.asarray(rvq.quantize(st, z)))
    np.testing.assert_allclose(
        np.asarray(fwd.quantized),
        np.asarray(rvq.dequantize(st, fwd.indices)),
        rtol=1e-5, atol=1e-5,
    )
    # STE: d(sum(zq))/dz == ones (identity gradient through quantization)
    g = jax.grad(lambda zz: jnp.sum(rvq.forward(st, zz).quantized))(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)


def test_commit_loss_grad_flows_to_encoder_side():
    cfg, st = _state()
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 15, cfg.latent_dim))
    g = jax.grad(lambda zz: rvq.forward(st, zz).commit_loss)(z)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_ema_update_moves_codebook_toward_data():
    cfg, st = _state()
    target = jnp.ones((1, 200, cfg.latent_dim)) * 2.0
    before = float(jnp.mean(jnp.abs(st["codebooks"][0] - 2.0)))
    for i in range(30):
        fwd = rvq.forward(st, target)
        st = rvq.ema_update(st, fwd.counts, fwd.sums, decay=0.8)
    # the used code should converge to the data point
    idx = rvq.quantize(st, target)
    used = int(idx[0, 0, 0])
    after = float(jnp.mean(jnp.abs(st["codebooks"][0, used] - 2.0)))
    assert after < before
    assert after < 0.05


def test_dead_code_reseed():
    cfg, st = _state()
    data = jax.random.normal(jax.random.PRNGKey(6), (1, 100, cfg.latent_dim)) + 10.0
    fwd = rvq.forward(st, data)
    pool = data.reshape(-1, cfg.latent_dim)
    cand = rvq.sample_reseed_candidates(
        jax.random.PRNGKey(7), pool, cfg.num_quantizers, cfg.codebook_size
    )
    st2 = rvq.ema_update(
        st, fwd.counts, fwd.sums, decay=0.5, reseed_candidates=cand
    )
    # most codes were dead (data is a far-away cluster) -> reseeded near 10
    cb = np.asarray(st2["codebooks"][0])
    assert np.mean(np.abs(cb.mean(-1) - 10.0) < 2.0) > 0.5


def test_quantizer_dropout_depth_masking():
    cfg, st = _state()
    z = jax.random.normal(jax.random.PRNGKey(8), (3, 12, cfg.latent_dim))
    depth = jnp.asarray([1, 2, 2])
    fwd = rvq.forward(st, z, depth=depth)
    # sample 0 output must equal depth-1 dequantization
    ref0 = rvq.dequantize(st, fwd.indices[0:1], n_q=1)
    np.testing.assert_allclose(np.asarray(fwd.quantized[0:1]), np.asarray(ref0), rtol=1e-5, atol=1e-5)
    ref1 = rvq.dequantize(st, fwd.indices[1:2], n_q=2)
    np.testing.assert_allclose(np.asarray(fwd.quantized[1:2]), np.asarray(ref1), rtol=1e-5, atol=1e-5)


def test_forward_psum_under_shard_map():
    """EMA stats must be identical whether computed on 1 device or psum'd
    across a DP mesh (SURVEY.md §8 hard-part #2)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    cfg, st = _state()
    n_dev = len(jax.devices())
    z = jax.random.normal(jax.random.PRNGKey(9), (2 * n_dev, 8, cfg.latent_dim))
    single = rvq.forward(st, z)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    fn = shard_map(
        lambda s, zz: rvq.forward(s, zz, axis_name="data")[3:5],
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
    )
    counts, sums = fn(st, z)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(single.counts), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(single.sums), rtol=1e-5, atol=1e-4)


def test_perplexity():
    counts = jnp.asarray([[10.0, 10.0, 0.0, 0.0]])
    p = rvq.codebook_perplexity(counts)
    np.testing.assert_allclose(np.asarray(p), [2.0], rtol=1e-5)


def test_init_codebooks_from_data():
    """Data-driven init (VERDICT r3 #4): every code must land inside the
    latent distribution (book 0 = k-means of the pool itself), EMA stats
    must be consistent (codebook == ema_sum/ema_count), and the whole init
    must be deterministic in the key."""
    cfg, st = _state()
    k = cfg.codebook_size
    z = jax.random.normal(jax.random.PRNGKey(5), (4, 64, cfg.codebook_dim))
    pool = np.asarray(z.reshape(-1, cfg.codebook_dim))
    out = rvq.init_codebooks_from_data(jax.random.PRNGKey(7), st, z)
    assert out["codebooks"].shape == st["codebooks"].shape
    # book 0 codes sit inside the pool's bounding box (means of pool points)
    cb0 = np.asarray(out["codebooks"][0])
    assert cb0.min() >= pool.min() - 1e-5 and cb0.max() <= pool.max() + 1e-5
    # with a pool >= K, k-means-refined codes are non-degenerate: usage of
    # book 0 over the pool itself is high (every code near data)
    idx0 = np.asarray(rvq._nearest(jnp.asarray(pool), out["codebooks"][0]))
    assert len(np.unique(idx0)) > 0.5 * k
    # EMA stats consistent: sum / count == codebook
    np.testing.assert_allclose(
        np.asarray(out["ema_sum"] / out["ema_count"][..., None]),
        np.asarray(out["codebooks"]),
        rtol=1e-5,
    )
    out2 = rvq.init_codebooks_from_data(jax.random.PRNGKey(7), st, z)
    np.testing.assert_array_equal(
        np.asarray(out["codebooks"]), np.asarray(out2["codebooks"])
    )


def test_argmin_margins_matches_dense_oracle():
    """argmin_margins == (second-smallest - smallest) of the exact `_nearest`
    score (||c||^2 - 2 r.c in f32), with the residual chain following the
    canonical top1 path (VERDICT r4 #5 pin-stability diagnostic)."""
    cfg, st = _state()
    z = np.random.RandomState(3).randn(2, 9, cfg.codebook_dim).astype(
        np.float32
    )
    got = np.asarray(rvq.argmin_margins(st, jnp.asarray(z)))
    assert got.shape == (2, 9, cfg.num_quantizers)
    assert (got >= 0).all()

    r = z.reshape(-1, cfg.codebook_dim).astype(np.float32)
    books = np.asarray(st["codebooks"], np.float32)
    want = np.zeros((r.shape[0], books.shape[0]), np.float32)
    for q, cb in enumerate(books):
        scores = (cb * cb).sum(-1)[None, :] - 2.0 * r @ cb.T
        part = np.sort(scores, axis=-1)[:, :2]
        want[:, q] = part[:, 1] - part[:, 0]
        r = r - cb[np.argmin(scores, axis=-1)]
    np.testing.assert_allclose(
        got.reshape(-1, books.shape[0]), want, rtol=1e-4, atol=1e-5
    )
