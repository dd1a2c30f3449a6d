"""Multi-scale + multi-period discriminators (SURVEY.md §3 #13;
BASELINE.json:10 "multi-scale/multi-period discriminators").

HiFi-GAN-family design [INFERRED, canonical]:
  * MPD: one 2D-conv discriminator per period p in (2,3,5,7,11); the waveform
    is reshaped to (N, T/p, p, 1) so periodic structure lands on the second
    spatial axis; kernels (5,1), strides (3,1).
  * MSD: one grouped-1D-conv discriminator per scale (1x, /2, /4 via strided
    average pooling).

TPU notes: NHWC layout, LeakyReLU(0.1) fused by XLA into the convs; all
discriminators evaluate real|fake as a single doubled batch in the train step
so the MXU sees one large batch instead of two small ones.

Returns per-sub-discriminator (logits, intermediate features) — features feed
the feature-matching loss (BASELINE.json:10).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nsc_tpu.ops import conv as C

Params = Dict[str, Any]

PERIODS = (2, 3, 5, 7, 11)
MSD_SCALES = 3

# (out_ch, kernel, stride, groups) per MSD layer
_MSD_LAYERS = (
    (16, 15, 1, 1),
    (64, 41, 4, 4),
    (256, 41, 4, 16),
    (1024, 41, 4, 64),
    (1024, 5, 1, 1),
)
_MPD_CHANNELS = (32, 128, 512, 1024)
_LRELU = 0.1


def _init_conv_general(
    key, kernel: Sequence[int], in_ch: int, out_ch: int, groups: int = 1
) -> Params:
    kw, kb = jax.random.split(key)
    import numpy as _np

    fan_in = (in_ch // groups) * int(_np.prod(kernel))
    bound = 1.0 / jnp.sqrt(fan_in)
    shape = (*kernel, in_ch // groups, out_ch)
    v = jax.random.uniform(kw, shape, jnp.float32, -bound, bound)
    g = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1))))
    b = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return {"v": v, "g": g, "b": b}


def _apply_conv_general(
    p: Params, x: jax.Array, *, strides, padding, groups: int = 1
) -> jax.Array:
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(
        jnp.sum(v * v, axis=tuple(range(v.ndim - 1)), keepdims=True) + 1e-12
    )
    w = (v * (g / norm)).astype(x.dtype)
    nd = v.ndim - 2  # spatial dims
    dn = ("NWC", "WIO", "NWC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=dn, feature_group_count=groups,
    )
    return y + p["b"].astype(y.dtype)


# ---------------------------------------------------------------------------
# multi-period
# ---------------------------------------------------------------------------


def _scaled(ch: int, mult: float, groups: int = 1) -> int:
    """Scale a channel width, keeping it a positive multiple of `groups`."""
    s = max(1, int(round(ch * mult / groups))) * groups
    return s


def _init_mpd_one(key, width_mult: float = 1.0) -> List[Params]:
    keys = jax.random.split(key, len(_MPD_CHANNELS) + 1)
    layers = []
    in_ch = 1
    for k, out_ch in zip(keys[:-1], _MPD_CHANNELS):
        out_ch = _scaled(out_ch, width_mult)
        layers.append(_init_conv_general(k, (5, 1), in_ch, out_ch))
        in_ch = out_ch
    layers.append(_init_conv_general(keys[-1], (3, 1), in_ch, 1))
    return layers


def _apply_mpd_one(
    layers: List[Params], wav: jax.Array, period: int
) -> Tuple[jax.Array, List[jax.Array]]:
    n, t = wav.shape
    pad = (-t) % period
    x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if pad < t else "constant")
    x = x.reshape(n, -1, period, 1)  # NHWC: H=T/p, W=p
    feats = []
    for i, p in enumerate(layers[:-1]):
        stride = (3, 1) if i < len(layers) - 2 else (1, 1)
        x = _apply_conv_general(p, x, strides=stride, padding=[(2, 2), (0, 0)])
        x = jax.nn.leaky_relu(x, _LRELU)
        feats.append(x)
    x = _apply_conv_general(layers[-1], x, strides=(1, 1), padding=[(1, 1), (0, 0)])
    feats.append(x)
    return x.reshape(n, -1), feats


# ---------------------------------------------------------------------------
# multi-scale
# ---------------------------------------------------------------------------


def _init_msd_one(key, width_mult: float = 1.0) -> List[Params]:
    import math

    keys = jax.random.split(key, len(_MSD_LAYERS) + 1)
    layers = []
    in_ch = 1
    for k, (out_ch, kernel, _, groups) in zip(keys[:-1], _MSD_LAYERS):
        g = math.gcd(groups, in_ch)  # groups must divide in_ch (shrinks when
        out_ch = _scaled(out_ch, width_mult, g)  # width_mult narrows layers)
        layers.append(_init_conv_general(k, (kernel,), in_ch, out_ch, g))
        in_ch = out_ch
    layers.append(_init_conv_general(keys[-1], (3,), in_ch, 1))
    return layers


def _apply_msd_one(
    layers: List[Params], wav: jax.Array
) -> Tuple[jax.Array, List[jax.Array]]:
    x = wav[..., None]  # (N, T, 1)
    feats = []
    for p, (_, kernel, stride, _) in zip(layers[:-1], _MSD_LAYERS):
        pad = (kernel - 1) // 2
        groups = x.shape[-1] // p["v"].shape[-2]  # from param shapes
        x = _apply_conv_general(
            p, x, strides=(stride,), padding=[(pad, pad)], groups=groups
        )
        x = jax.nn.leaky_relu(x, _LRELU)
        feats.append(x)
    x = _apply_conv_general(layers[-1], x, strides=(1,), padding=[(1, 1)])
    feats.append(x)
    return x.reshape(x.shape[0], -1), feats


def _avg_pool_half(wav: jax.Array) -> jax.Array:
    """AvgPool1d(kernel=4, stride=2, pad=1) between MSD scales."""
    x = wav[:, None, :, None]  # NHWC with H=1
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, 1, 4, 1), (1, 1, 2, 1), [(0, 0), (0, 0), (1, 1), (0, 0)]
    ) / 4.0
    return y[:, 0, :, 0]


# ---------------------------------------------------------------------------
# combined
# ---------------------------------------------------------------------------


def init_discriminators(
    key: jax.Array,
    width_mult: float = 1.0,
    *,
    periods: Sequence[int] = PERIODS,
    msd_scales: int = MSD_SCALES,
) -> Params:
    """width_mult scales all channel widths (1.0 = full size; small values
    make CPU smoke tests feasible — apply() reads widths from param shapes).
    `periods`/`msd_scales` set the ensemble STRUCTURE (defaults = the
    HiFi-GAN-family full set); pass the same values to apply_discriminators.
    Smaller sets exist for compile-budgeted checks (the multichip dryrun) and
    ablations, not for flagship training."""
    km, ks = jax.random.split(key)
    return {
        "mpd": [
            _init_mpd_one(k, width_mult)
            for k in jax.random.split(km, len(periods))
        ],
        "msd": [
            _init_msd_one(k, width_mult)
            for k in jax.random.split(ks, msd_scales)
        ],
    }


def apply_discriminators(
    params: Params, wav: jax.Array, *, periods: Sequence[int] = PERIODS
) -> List[Tuple[jax.Array, List[jax.Array]]]:
    """(N, T) -> list over all sub-discriminators of (logits, features)."""
    assert len(params["mpd"]) == len(periods), (
        f"params built for {len(params['mpd'])} periods, got {periods}"
    )
    outs = []
    for layers, period in zip(params["mpd"], periods):
        outs.append(_apply_mpd_one(layers, wav, period))
    x = wav
    for i, layers in enumerate(params["msd"]):
        if i > 0:
            x = _avg_pool_half(x)
        outs.append(_apply_msd_one(layers, x))
    return outs
