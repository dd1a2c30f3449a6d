"""Fused residual-stack kernel vs per-op reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsc_tpu.configs import get_config
from nsc_tpu.models import seanet
from nsc_tpu.ops.pallas import residual_stack as RS


def _setup(c=16, dilations=(1, 3, 9), seed=0):
    import dataclasses

    cfg = dataclasses.replace(
        get_config("tiny_test"), dilations=dilations, base_width=c
    )
    key = jax.random.PRNGKey(seed)
    units = [
        seanet._init_residual_unit(k, c, cfg.residual_kernel, cfg)
        for k in jax.random.split(key, len(dilations))
    ]
    return cfg, units


@pytest.mark.parametrize("t", [512, 300])
def test_fused_stack_matches_reference(t):
    cfg, units = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, 16), jnp.float32)
    ref = x
    for u, d in zip(units, cfg.dilations):
        ref = seanet._apply_residual_unit(u, ref, d, cfg, "causal")
    packed = RS.pack_stage_params(units, cfg)
    got = RS.residual_stack_pallas(
        x, *packed, dilations=tuple(cfg.dilations), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_stack_multi_tile_boundaries():
    """Tile halos must hand unit outputs across tile boundaries exactly."""
    cfg, units = _setup()
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1024, 16), jnp.float32)
    ref = x
    for u, d in zip(units, cfg.dilations):
        ref = seanet._apply_residual_unit(u, ref, d, cfg, "causal")
    packed = RS.pack_stage_params(units, cfg)
    got = RS.residual_stack_pallas(
        x, *packed, dilations=tuple(cfg.dilations), interpret=True, tile_t=128
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_stack_ragged_last_tile():
    cfg, units = _setup()
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 700, 16), jnp.float32)
    ref = x
    for u, d in zip(units, cfg.dilations):
        ref = seanet._apply_residual_unit(u, ref, d, cfg, "causal")
    packed = RS.pack_stage_params(units, cfg)
    got = RS.residual_stack_pallas(
        x, *packed, dilations=tuple(cfg.dilations), interpret=True, tile_t=256
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_stack_fast_act_close():
    """fast_act=True (polynomial sin^2) stays within poly tolerance."""
    cfg, units = _setup()
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 512, 16), jnp.float32)
    ref = x
    for u, d in zip(units, cfg.dilations):
        ref = seanet._apply_residual_unit(u, ref, d, cfg, "causal")
    packed = RS.pack_stage_params(units, cfg)
    got = RS.residual_stack_pallas(
        x, *packed, dilations=tuple(cfg.dilations), interpret=True,
        fast_act=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_fused_stack_single_dilation():
    cfg, units = _setup(c=8, dilations=(1,))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 8), jnp.float32)
    ref = seanet._apply_residual_unit(units[0], x, 1, cfg, "causal")
    packed = RS.pack_stage_params(units, cfg)
    got = RS.residual_stack_pallas(x, *packed, dilations=(1,), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_ct_stack_matches_reference():
    """CT-layout fused stage kernel (channels-on-sublanes; the serving-path
    default via unit_backend='auto'): float-tolerance equal to the per-op
    reference for both activations, across tile boundaries and batch."""
    import dataclasses

    from nsc_tpu.configs import get_config
    from nsc_tpu.models import seanet
    from nsc_tpu.ops.pallas import residual_stack as RS

    for act in ("snake_fast", "snake"):
        cfg = dataclasses.replace(get_config("base"), activation=act)
        Cc, T, B = 32, 4096, 2
        units = [
            seanet._init_residual_unit(jax.random.PRNGKey(i), Cc, 3, cfg)
            for i in range(3)
        ]
        x = jnp.asarray(
            np.random.RandomState(0).randn(B, T, Cc).astype(np.float32) * 0.5
        )
        h = x
        for unit, dil in zip(units, cfg.dilations):
            h = seanet._apply_residual_unit(unit, h, dil, cfg, "causal")
        ref = np.asarray(h)
        packed = RS.pack_stage_params(units, cfg)
        out = RS.residual_stack_ct_pallas(
            jnp.swapaxes(x, 1, 2), *packed, dilations=tuple(cfg.dilations),
            interpret=True, fast_act=(act == "snake_fast"), tile_t=1024,
        )
        got = np.asarray(jnp.swapaxes(out, 1, 2))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ct_stack_tile_boundary_and_padding():
    """Lengths that don't divide the tile, and the zero-halo of tile 0."""
    import dataclasses

    from nsc_tpu.configs import get_config
    from nsc_tpu.models import seanet
    from nsc_tpu.ops.pallas import residual_stack as RS

    cfg = dataclasses.replace(get_config("base"), activation="snake_fast")
    Cc = 16
    units = [
        seanet._init_residual_unit(jax.random.PRNGKey(i), Cc, 3, cfg)
        for i in range(3)
    ]
    x = jnp.asarray(
        np.random.RandomState(1).randn(1, 1000, Cc).astype(np.float32)
    )
    h = x
    for unit, dil in zip(units, cfg.dilations):
        h = seanet._apply_residual_unit(unit, h, dil, cfg, "causal")
    packed = RS.pack_stage_params(units, cfg)
    out = RS.residual_stack_ct_pallas(
        jnp.swapaxes(x, 1, 2), *packed, dilations=tuple(cfg.dilations),
        interpret=True, fast_act=True, tile_t=256,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(h),
        rtol=1e-4, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# boundary-fused variant (head = down_act + strided conv, tail = up_act +
# transposed conv) — r2b serving path
# ---------------------------------------------------------------------------


def _boundary_cfg(act="snake"):
    import dataclasses

    return dataclasses.replace(
        get_config("base"), base_width=8, strides=(2, 4, 5),
        dilations=(1, 3), latent_dim=16, codebook_dim=16, activation=act,
    )


def _rand(shape, seed, scale=0.5):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale
    )


@pytest.mark.parametrize("t", [777, 1280])
def test_fused_boundary_encoder_matches_reference(t):
    """Full encoder: unit_backend='pallas_ct_fused' (interpret off-TPU) must
    match the per-op reference to f32 tolerance, including the
    phase-decomposed strided heads and ceil-length stages."""
    import dataclasses

    cfg = _boundary_cfg()
    cfg_f = dataclasses.replace(cfg, unit_backend="pallas_ct_fused")
    p = seanet.init_encoder(jax.random.PRNGKey(0), cfg)
    x = _rand((2, t, 1), 1)
    ref = seanet.apply_encoder(p, x, cfg)
    got = seanet.apply_encoder(p, x, cfg_f)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("f", [100, 33])
def test_fused_boundary_decoder_matches_reference(f):
    import dataclasses

    cfg = _boundary_cfg()
    cfg_f = dataclasses.replace(cfg, unit_backend="pallas_ct_fused")
    p = seanet.init_decoder(jax.random.PRNGKey(0), cfg)
    z = _rand((2, f, cfg.latent_dim), 2, 1.0)
    ref = seanet.apply_decoder(p, z, cfg)
    got = seanet.apply_decoder(p, z, cfg_f)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_fused_boundary_fast_act_close():
    import dataclasses

    cfg = _boundary_cfg("snake_fast")
    cfg_f = dataclasses.replace(cfg, unit_backend="pallas_ct_fused")
    pe = seanet.init_encoder(jax.random.PRNGKey(0), cfg)
    x = _rand((1, 999, 1), 3)
    np.testing.assert_allclose(
        np.asarray(seanet.apply_encoder(pe, x, cfg_f)),
        np.asarray(seanet.apply_encoder(pe, x, cfg)),
        rtol=1e-3, atol=1e-3,
    )


def test_fused_stage_head_tile_boundaries():
    """Strided head across small tiles: the halo lane must hand the previous
    tile's phase-decomposed activations over exactly."""
    cfg, units = _setup(c=16, dilations=(1, 3))
    s = 4
    key = jax.random.PRNGKey(7)
    act_p = seanet._init_residual_unit(key, 8, 3, cfg)["act1"]  # 8-ch alpha
    down = seanet.C.init_conv(key, 2 * s, 8, 16, weight_norm=True)
    x = _rand((2, 1111, 8), 8)  # (B, T, C_prev)

    h = seanet.C.activation("snake", x, act_p)
    h = seanet.C.conv1d(h, down, stride=s, padding="causal")
    ref = h
    for u, d in zip(units, cfg.dilations):
        ref = seanet._apply_residual_unit(u, ref, d, cfg, "causal")

    head = RS.pack_head_params(act_p, down, s, jnp.float32)
    packed = RS.pack_stage_params(units, cfg)
    out = RS.fused_stage_ct_pallas(
        jnp.swapaxes(x, 1, 2), head, *packed, None,
        dilations=tuple(cfg.dilations), s_head=s, interpret=True, tile_t=128,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(ref),
        rtol=1e-4, atol=1e-5,
    )


def test_fused_stage_tail_tile_boundaries():
    """Transposed tail across small tiles: phase-major emission +
    de-interleave must equal conv_transpose1d exactly."""
    cfg, units = _setup(c=16, dilations=(1, 3))
    s = 5
    key = jax.random.PRNGKey(9)
    act_p = seanet.C.activation_init("snake", 16)
    up = seanet.C.init_conv(key, 2 * s, 16, 8, weight_norm=True)
    x = _rand((2, 700, 16), 10)

    ref = x
    for u, d in zip(units, cfg.dilations):
        ref = seanet._apply_residual_unit(u, ref, d, cfg, "causal")
    ref = seanet.C.activation("snake", ref, act_p)
    ref = seanet.C.conv_transpose1d(ref, up, stride=s, causal=True)

    tail = RS.pack_tail_params(act_p, up, s, jnp.float32)
    packed = RS.pack_stage_params(units, cfg)
    out = RS.fused_stage_ct_pallas(
        jnp.swapaxes(x, 1, 2), None, *packed, tail,
        dilations=tuple(cfg.dilations), s_tail=s, interpret=True, tile_t=128,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(ref),
        rtol=1e-4, atol=1e-5,
    )
