"""1D convolution primitives (SURVEY.md §3 #3; BASELINE.json:5
"causal/dilated conv blocks" are a declared hot path).

TPU-first design decisions:
  * Layout is channels-last (N, T, C) with dimension_numbers ('NWC','WIO','NWC')
    — the native TPU layout; XLA lowers these convs onto the MXU without
    transposes.
  * Weight-norm is a parameterization (v, g), materialized at apply time; XLA
    constant-folds / fuses the normalization into the conv when params are
    donated or under jit.
  * Causal padding is explicit left-padding, so the same kernel serves batch
    and streaming mode (streaming carries the left context as state instead
    of zeros — see nsc_tpu/streaming.py).
  * Transposed convs are built from lax.conv_transpose with VALID padding and
    explicit trimming, so torch ConvTranspose1d padding semantics never leak
    into the bitstream-relevant shapes (SURVEY.md §8 hard-part #3).

Parameters are plain pytrees: {'v': (K, Cin, Cout), 'g': (Cout,)} for
weight-normed convs, {'w': (K, Cin, Cout)} otherwise, plus {'b': (Cout,)}.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, jax.Array]

_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_conv(
    key: jax.Array,
    kernel: int,
    in_ch: int,
    out_ch: int,
    *,
    weight_norm: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Kaiming-uniform init matching torch.nn.Conv1d defaults, so a torch
    checkpoint maps 1:1 onto these params (SURVEY.md §3 #11)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(
        kw, (kernel, in_ch, out_ch), dtype, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(kb, (out_ch,), dtype, minval=-bound, maxval=bound)
    if weight_norm:
        # g initialized to ||v|| per out-channel => w == v at init (torch
        # weight_norm semantics).
        g = jnp.sqrt(jnp.sum(w * w, axis=(0, 1)))
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def materialize_weight(params: Params) -> jax.Array:
    """Resolve weight-norm parameterization to a concrete (K, Cin, Cout)."""
    if "w" in params:
        return params["w"]
    v, g = params["v"], params["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    return v * (g[None, None, :] / norm)


# ---------------------------------------------------------------------------
# forward ops
# ---------------------------------------------------------------------------


def conv1d(
    x: jax.Array,
    params: Params,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "causal",
) -> jax.Array:
    """1D conv over (N, T, Cin) -> (N, T', Cout).

    padding:
      'causal' — left-pad (K-1)*dilation: output frame t sees inputs <= t.
      'same'   — symmetric pad (left gets the smaller half), stride-aware.
      'valid'  — no padding.
    """
    w = materialize_weight(params)
    k = w.shape[0]
    eff = (k - 1) * dilation
    if padding == "causal":
        pads = [(eff, 0)]
    elif padding == "same":
        pads = [(eff // 2, eff - eff // 2)]
    elif padding == "valid":
        pads = [(0, 0)]
    else:
        raise ValueError(f"bad padding {padding!r}")
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def conv_transpose1d(
    x: jax.Array,
    params: Params,
    *,
    stride: int,
    causal: bool = True,
) -> jax.Array:
    """Transposed 1D conv (upsampling by `stride`), (N, T, Cin) -> (N, T*stride, Cout).

    Implemented as VALID lax.conv_transpose (full output length
    (T-1)*stride + K) followed by an explicit trim of K - stride samples:
    causal mode trims from the right (streaming-safe), non-causal splits the
    trim across both edges. Output length is exactly T*stride either way,
    which keeps encode/decode lengths mirror-exact for bitstream round-trips.
    """
    w = materialize_weight(params)
    k = w.shape[0]
    if k < stride:
        raise ValueError("kernel must be >= stride for exact-length upsampling")
    # Canonical transposed-conv construction (impulse-verified): dilate the
    # input by `stride`, full-pad, convolve with the tap-flipped kernel.
    # Equivalent to scatter-accumulate out[i*s + tap] += x[i] @ w[tap]; built
    # from conv_general_dilated directly so no lax.conv_transpose kernel-
    # layout ambiguity can leak into bitstream-relevant shapes.
    y = lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0).astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
    )
    trim = k - stride
    if trim > 0:
        if causal:
            y = y[:, :-trim, :]
        else:
            left = trim // 2
            y = y[:, left : left + x.shape[1] * stride, :]
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def init_snake(channels: int, dtype=jnp.float32) -> Params:
    return {"alpha": jnp.ones((channels,), dtype)}


def snake(x: jax.Array, params: Params) -> jax.Array:
    """Snake activation x + sin^2(alpha*x)/alpha, per-channel alpha
    (periodic inductive bias for audio; DAC-style [INFERRED])."""
    alpha = params["alpha"].astype(x.dtype)
    # guard alpha ~ 0: sin^2(ax)/a -> a*x^2, use reciprocal with eps
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)


def fast_sin(t: jax.Array) -> jax.Array:
    """Range-reduced degree-9 polynomial sine.

    XLA's precise sin (Payne-Hanek-grade range reduction) dominates this
    codec's runtime: the snake sites cost ~500 ms of the 636 ms
    encode+decode at bench scale (docs/PERFORMANCE.md). Activations are
    bounded here, so reduce t to [-pi/2, pi/2] with one round() and evaluate
    the Taylor polynomial: max abs error ~4e-6 over +-100 — far below bf16
    resolution (8e-3) and below f32 conv noise. ~12 VPU ops, fuses into conv
    epilogues."""
    f = t.astype(jnp.float32)
    k = jnp.round(f * (1.0 / np.pi))
    r = f - k * np.pi
    parity = k - 2.0 * jnp.floor(k * 0.5)  # exact 0/1 for integral floats
    sign = 1.0 - 2.0 * parity
    r2 = r * r
    # sin(r) Taylor to r^9 on [-pi/2, pi/2]
    p = r * (
        1.0
        + r2 * (-1.0 / 6.0 + r2 * (1.0 / 120.0 + r2 * (-1.0 / 5040.0 + r2 * (1.0 / 362880.0))))
    )
    return (sign * p).astype(t.dtype)


# Chebyshev-node fit of sin^2(sqrt(u))/u, u in [0, (pi/2)^2]; u*Q3(u) has
# max abs error 8.1e-5 over all reals after reduction — ~100x below bf16
# resolution (the activation tensors' dtype on the serving path), verified
# in f32 Horner arithmetic over +-100 (tests/unit/test_fast_sin.py).
_SIN_SQ_C3 = -0.00254553
_SIN_SQ_C2 = 0.04350543
_SIN_SQ_C1 = -0.33287596
_SIN_SQ_C0 = 0.99996482


def _sin_sq_fast(t: jax.Array) -> jax.Array:
    """sin^2(t) as a direct EVEN polynomial u*Q(u), u = reduced(t)^2.

    sin^2 is pi-periodic and even in the reduced argument, so no sign/parity
    chain is needed; fitting sin^2 directly (rather than sin, then squaring)
    drops two more VPU ops — the snake sites are ALU-bound at the VPU's
    measured ~0.6 T ops/s (docs/PERFORMANCE.md), so op count is wall time.
    8 VPU ops total."""
    f = t.astype(jnp.float32)
    r = f - jnp.round(f * (1.0 / np.pi)) * np.pi  # r in [-pi/2, pi/2]
    u = r * r
    q = _SIN_SQ_C0 + u * (_SIN_SQ_C1 + u * (_SIN_SQ_C2 + u * _SIN_SQ_C3))
    return (u * q).astype(t.dtype)


def snake_fast(x: jax.Array, params: Params) -> jax.Array:
    """Snake with the polynomial sin^2 — the serving-path activation
    (cfg.activation = 'snake_fast'); same parameters as 'snake'."""
    alpha = params["alpha"].astype(x.dtype)
    inv = (1.0 / (params["alpha"] + 1e-9)).astype(x.dtype)  # (C,) once
    return x + _sin_sq_fast(alpha * x) * inv


def activation(name: str, x: jax.Array, params: Optional[Params]) -> jax.Array:
    if name == "snake":
        return snake(x, params)
    if name == "snake_fast":
        return snake_fast(x, params)
    if name == "elu":
        return jax.nn.elu(x)
    raise ValueError(f"unknown activation {name!r}")


def activation_init(name: str, channels: int, dtype=jnp.float32):
    """Returns activation params (or None for parameter-free activations)."""
    if name in ("snake", "snake_fast"):
        return init_snake(channels, dtype)
    return None
