"""MXU-shaped conv formulations (TPU hot path, BASELINE.json:5
"causal/dilated conv blocks ... fused").

The SEANet stacks run at tiny channel counts (32-64) where XLA's native 1D
conv lowering reaches ~5% of attainable MXU throughput on v5e (measured in
this repo's profile step: 1.6 TF/s vs 33 TF/s matmul calibration). These
reformulations express every conv in the model as ONE large dot_general with
MXU-friendly contraction/output dims:

  * dilation d      -> phase decomposition: d interleaved streams, each a
                       dense (dilation-1) conv. Exact, no extra FLOPs.
  * stride-1 conv   -> output-stacking: S consecutive outputs become one
                       matmul row block against a block-Toeplitz weight
                       ((S + k - 1) * Cin x S * Cout). FLOPs inflate by
                       (S+k-1)/k but MXU utilization rises ~10x; net win.
  * strided conv    -> same stacking with stride-aligned context groups.
  * transposed conv -> polyphase synthesis: all `stride` output phases of a
                       frame from one matmul (ceil(k/s) input frames x
                       s * Cout). Exact, no extra FLOPs.

All are numerically EXACT reformulations (same f32/bf16 contraction on the
MXU, taps reordered only within a dot product) — tested to tight tolerance
against nsc_tpu.ops.conv in tests/unit/test_fastconv.py, and index-parity
tested end-to-end. Bias/weight-norm handling matches ops.conv.

Shape constraints (asserted): T divisible by dilation * stride * stack-group;
model call sites guarantee this for hop-multiple inputs.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu.ops.conv import materialize_weight


@functools.lru_cache(maxsize=256)
def _toeplitz_map(k: int, stride: int, stack: int, ctx_len: int, window: int):
    """numpy (window, stack) -> tap index + validity for the block-Toeplitz
    weight: output slot q at window row j uses tap = j - ctx_len - q*stride
    + (k-1) when 0 <= tap < k."""
    j = np.arange(window)[:, None]
    q = np.arange(stack)[None, :]
    tap = j - ctx_len - q * stride + (k - 1)
    valid = (tap >= 0) & (tap < k)
    return np.clip(tap, 0, k - 1), valid


def _block_toeplitz(w: jax.Array, stride: int, stack: int, ctx_len: int) -> jax.Array:
    """w (k, Cin, Cout) -> (window, Cin, stack, Cout) block weight."""
    k = w.shape[0]
    window = ctx_len + stack * stride
    tap, valid = _toeplitz_map(k, stride, stack, ctx_len, window)
    wb = w[tap]  # (window, stack, Cin, Cout)
    wb = jnp.where(jnp.asarray(valid)[:, :, None, None], wb, 0)
    return jnp.transpose(wb, (0, 2, 1, 3))  # (window, Cin, stack, Cout)


def stacked_conv1d(
    x: jax.Array,
    params,
    *,
    stride: int = 1,
    dilation: int = 1,
    stack: int = 8,
) -> jax.Array:
    """Causal conv (N, T, Cin) -> (N, T/stride, Cout) as one MXU matmul.
    Exact equivalent of ops.conv.conv1d(..., padding='causal')."""
    w = materialize_weight(params).astype(x.dtype)
    k = w.shape[0]

    if dilation > 1:
        assert stride == 1, "dilated strided convs not used by this model"
        b, t, c = x.shape
        pad_t = (-t) % dilation
        if pad_t:
            # right-pad to a phase multiple: future zeros can't affect causal
            # outputs, so trimming afterwards is exact.
            y = stacked_conv1d(
                jnp.pad(x, ((0, 0), (0, pad_t), (0, 0))),
                params, stride=1, dilation=dilation, stack=stack,
            )
            return y[:, :t]
        xs = (
            x.reshape(b, t // dilation, dilation, c)
            .transpose(0, 2, 1, 3)
            .reshape(b * dilation, t // dilation, c)
        )
        y = stacked_conv1d(xs, {"w": w}, stride=1, dilation=1, stack=stack)
        co = y.shape[-1]
        y = (
            y.reshape(b, dilation, t // dilation, co)
            .transpose(0, 2, 1, 3)
            .reshape(b, t, co)
        )
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        return y

    b, t, c = x.shape
    co = w.shape[2]
    s = stride
    assert t % s == 0, (t, s)
    t_out = t // s
    stack = min(stack, t_out)
    pad_t = (-t_out % stack) * s
    if pad_t:
        # right-pad to a whole number of output tiles; causal outputs in
        # [0, t_out) are unaffected by future zeros, so trimming is exact.
        y = stacked_conv1d(
            jnp.pad(x, ((0, 0), (0, pad_t), (0, 0))),
            params, stride=s, dilation=1, stack=stack,
        )
        return y[:, :t_out]
    g = t_out // stack
    tile = stack * s  # input samples per output tile
    ctx_len = math.ceil((k - 1) / s) * s
    assert ctx_len <= tile, (
        f"kernel {k} too large for stack {stack} at stride {s}; raise conv_stack"
    )
    window = ctx_len + tile

    xp = jnp.pad(x, ((0, 0), (ctx_len, 0), (0, 0)))
    main = x.reshape(b, g, tile, c)
    ctx = xp[:, :t].reshape(b, g, tile, c)[:, :, :ctx_len]
    frames = jnp.concatenate([ctx, main], axis=2)  # (B, G, window, C)

    wb = _block_toeplitz(w, s, stack, ctx_len)  # (window, C, stack, Cout)
    y = jax.lax.dot_general(
        frames.reshape(b * g, window * c),
        wb.reshape(window * c, stack * co),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.reshape(b, t_out, co)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def polyphase_conv_transpose1d(
    x: jax.Array, params, *, stride: int
) -> jax.Array:
    """Causal transposed conv (N, F, Cin) -> (N, F*stride, Cout) as one
    matmul. Exact equivalent of ops.conv.conv_transpose1d(causal=True)."""
    w = materialize_weight(params).astype(x.dtype)
    k, c, co = w.shape
    s = stride
    n_frames = math.ceil(k / s)  # input frames contributing to one out frame

    b, f, _ = x.shape
    views = [x]
    for m in range(1, n_frames):
        views.append(jnp.pad(x, ((0, 0), (m, 0), (0, 0)))[:, :f])
    frames = jnp.stack(views, axis=2)  # (B, F, n_frames, C); [:, :, m] = x[i-m]

    # Wt[m, cin, p, cout] = w[m*s + p] (zero when m*s + p >= k)
    m_idx = np.arange(n_frames)[:, None]
    p_idx = np.arange(s)[None, :]
    tap = m_idx * s + p_idx
    valid = tap < k
    wt = w[np.clip(tap, 0, k - 1)]  # (n_frames, s, C, Cout)
    wt = jnp.where(jnp.asarray(valid)[:, :, None, None], wt, 0)
    wt = jnp.transpose(wt, (0, 2, 1, 3))  # (n_frames, C, s, Cout)

    y = jax.lax.dot_general(
        frames.reshape(b * f, n_frames * c),
        wt.reshape(n_frames * c, s * co),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.reshape(b, f * s, co)
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y
