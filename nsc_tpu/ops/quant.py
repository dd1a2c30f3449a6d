"""int8 quantized inference path (W8A8, dynamic activation scales).

The codec's convs are memory-bound on TPU (docs/PERFORMANCE.md), so int8
halves the bound (bytes) AND doubles MXU peak. Scheme:

  * weights: per-output-channel symmetric int8, quantized inside the conv
    from the float params (weights are tiny; XLA folds the quantization) —
    no separate checkpoint format.
  * activations: per-tensor dynamic symmetric int8 (amax / 127), quantized
    at each conv input; accumulation in int32 on the MXU, dequantized by
    sx * sw into f32, bias added, rest of the graph unchanged.

Opt-in via CodecConfig.quant = "int8" (inference only; training stays
bf16/f32). Quality/parity impact is measured, not assumed — see
tests/unit/test_quant.py and docs/PERFORMANCE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nsc_tpu.ops.conv import materialize_weight

_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def _quantize_weight(w: jax.Array):
    """(K, Cin, Cout) f32 -> (int8 weights, (Cout,) f32 scales)."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1))  # per out-channel
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def _quantize_act(x: jax.Array):
    """(..., C) -> (int8, scalar f32 scale). Per-tensor dynamic symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return x8, scale


def conv1d_int8(
    x: jax.Array,
    params,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "causal",
) -> jax.Array:
    """W8A8 causal conv, same semantics as ops.conv.conv1d."""
    w = materialize_weight(params).astype(jnp.float32)
    w8, sw = _quantize_weight(w)
    x8, sx = _quantize_act(x)
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
    y32 = lax.conv_general_dilated(
        x8, w8,
        window_strides=(stride,),
        padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * (sx * sw)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv_transpose1d_int8(
    x: jax.Array, params, *, stride: int
) -> jax.Array:
    """W8A8 causal transposed conv, same semantics as ops.conv version."""
    w = materialize_weight(params).astype(jnp.float32)
    w8, sw = _quantize_weight(w)
    x8, sx = _quantize_act(x)
    k = w.shape[0]
    y32 = lax.conv_general_dilated(
        x8, jnp.flip(w8, axis=0),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32,
    )
    trim = k - stride
    if trim > 0:
        y32 = y32[:, :-trim, :]
    y = y32.astype(jnp.float32) * (sx * sw)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)
