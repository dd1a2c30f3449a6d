"""int8 quantized inference path (W8A8; dynamic or statically-calibrated
activation scales).

The codec's convs are memory-bound on TPU (docs/PERFORMANCE.md), so int8
halves the bound (bytes) AND doubles MXU peak. Scheme:

  * weights: per-output-channel symmetric int8, quantized inside the conv
    from the float params (weights are tiny; XLA folds the quantization) —
    no separate checkpoint format.
  * activations: per-tensor symmetric int8 (amax / 127), quantized at each
    conv input; accumulation in int32 on the MXU, dequantized by sx * sw
    into f32, bias added, rest of the graph unchanged.
  * scales: DYNAMIC by default (amax computed per call — two extra
    full-tensor passes per conv, which is why dynamic int8 measured SLOWER
    than bf16 on this memory-bound model, docs/PERFORMANCE.md r2), or
    STATIC via `calibrate_codec()`: representative audio is run once, each
    conv site's observed amax is stored in its param dict as an "a_s" leaf,
    and the serving path then quantizes with a constant scale (the amax
    passes disappear from the compiled graph).

Opt-in via CodecConfig.quant = "int8" (inference only; training stays
bf16/f32). Quality/parity impact is measured, not assumed — see
tests/unit/test_quant.py and docs/PERFORMANCE.md.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nsc_tpu.ops.conv import materialize_weight

_DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")

# calibration recorder: when set, _quantize_act appends each site's observed
# amax (eager forward only; conv call order is deterministic)
_RECORD: Optional[List[float]] = None


def _quantize_weight(w: jax.Array):
    """(K, Cin, Cout) f32 -> (int8 weights, (Cout,) f32 scales)."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1))  # per out-channel
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def _quantize_act(x: jax.Array, static_amax: Optional[jax.Array] = None):
    """(..., C) -> (int8, scale). Symmetric; dynamic per-tensor amax unless a
    calibrated static amax ("a_s" param leaf) is supplied — a scalar
    (per-tensor) or a (Cin,) vector (per-channel, folded into the weights by
    the conv: out = sum_c (w_c * s_c) x8_c, so it costs nothing at runtime).
    During calibration the recorder captures PER-CHANNEL amax (max over
    batch/time); per-tensor use reduces it again."""
    if static_amax is None:
        a = jnp.max(jnp.abs(x.astype(jnp.float32)))
        if _RECORD is not None:
            if isinstance(x, jax.core.Tracer):
                raise RuntimeError(
                    "int8 calibration requires an EAGER forward pass: the "
                    "recorder pulls concrete amax values, but this conv saw "
                    "a tracer (the reconstruct path is jitted). Run "
                    "calibrate_codec outside jit."
                )
            per_ch = jnp.max(
                jnp.abs(x.astype(jnp.float32)),
                axis=tuple(range(x.ndim - 1)),
            )
            _RECORD.append(np.asarray(per_ch))
        amax = a
    else:
        amax = static_amax.astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-12) / 127.0  # scalar or (Cin,)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return x8, scale


def _quantize_pair(x, params):
    """Quantize (activations, weights) for one conv site.

    Per-CHANNEL static scales (vector "a_s") are folded into the weights
    before weight quantization — out = sum_c (w_c * s_c) x8_c — so the
    per-channel precision costs nothing at runtime: the dequant factor is
    the per-out-channel weight scale alone."""
    w = materialize_weight(params).astype(jnp.float32)
    a_s = params.get("a_s")
    if a_s is not None and a_s.ndim == 1:
        s_c = jnp.maximum(a_s.astype(jnp.float32), 1e-12) / 127.0  # (Cin,)
        x8, _ = _quantize_act(x, a_s)
        w8, sw = _quantize_weight(w * s_c[None, :, None])
        return x8, w8, sw
    x8, sx = _quantize_act(x, a_s)
    w8, sw = _quantize_weight(w)
    return x8, w8, sx * sw


def conv1d_int8(
    x: jax.Array,
    params,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "causal",
) -> jax.Array:
    """W8A8 causal conv, same semantics as ops.conv.conv1d."""
    x8, w8, deq = _quantize_pair(x, params)
    k = w8.shape[0]
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
    y = y32.astype(jnp.float32) * deq
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv_transpose1d_int8(
    x: jax.Array, params, *, stride: int
) -> jax.Array:
    """W8A8 causal transposed conv, same semantics as ops.conv version."""
    x8, w8, deq = _quantize_pair(x, params)
    k = w8.shape[0]
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
    y = y32.astype(jnp.float32) * deq
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# static calibration
# ---------------------------------------------------------------------------


def _conv_sites(params):
    """Yield every conv param dict in FORWARD-CALL order (must mirror
    seanet.apply_encoder / apply_decoder exactly; asserted by count in
    calibrate_codec). Encoder: stem; per stage units(conv1, conv2) then the
    strided down conv; final. Decoder: stem; per stage the transposed up
    conv then units(conv1, conv2); final."""
    e = params["encoder"]
    yield e["stem"]
    for st in e["stages"]:
        for u in st["units"]:
            yield u["conv1"]
            yield u["conv2"]
        yield st["down"]
    yield e["final"]
    d = params["decoder"]
    yield d["stem"]
    for st in d["stages"]:
        yield st["up"]
        for u in st["units"]:
            yield u["conv1"]
            yield u["conv2"]
    yield d["final"]


def calibrate_codec(
    model, params, rvq, wav_batches, *, per_channel: bool = False
) -> dict:
    """Observe per-conv-site activation amax on representative audio and
    return params with an "a_s" static-amax leaf injected into every conv
    param dict — a scalar (per-tensor) by default, or a (Cin,) per-channel
    vector with per_channel=True (folded into the weight quantization, see
    _quantize_pair). MEASURED on the trained checkpoint: per-channel is
    WORSE here (0.44 vs 0.88 index agreement with float) — folding the
    activation scales multiplies the weight dynamic range by the channel
    spread, and the per-out-channel weight quantization loses more
    precision than the finer activation scales gain. Kept as an option for
    models with milder weight spread. Serving with these params +
    quant="int8" then uses constant scales — no dynamic amax passes in the
    compiled graph.

    `model.cfg.quant` must be "int8" (the recorder hooks the int8 conv
    path); runs eagerly (unjitted), so a few short batches suffice.
    The extra "a_s" leaf is ignored by the float conv path, so calibrated
    params remain valid for quant="none" serving and for checkpointing.
    """
    global _RECORD
    assert model.cfg.quant == "int8", "set cfg.quant='int8' for calibration"
    # NOTE: the module-global recorder makes calibration single-threaded by
    # construction; concurrent calibrate_codec calls would interleave
    # records. Calibration is a one-shot offline pass, so we guard rather
    # than thread a recorder object through every conv call (ADVICE r2).
    if _RECORD is not None:
        raise RuntimeError("calibrate_codec is not reentrant/thread-safe")
    site_amax = None
    for wav in wav_batches:
        _RECORD = []
        try:
            model.reconstruct(params, rvq, jnp.asarray(wav))
        finally:
            rec, _RECORD = _RECORD, None
        if site_amax is None:
            site_amax = rec
        else:
            assert len(rec) == len(site_amax), "conv call order changed"
            site_amax = [np.maximum(a, b) for a, b in zip(site_amax, rec)]
    assert site_amax, "no calibration batches given"
    if not per_channel:  # reduce each site's (Cin,) record to one scalar
        site_amax = [np.max(a) for a in site_amax]

    sites = list(_conv_sites(params))
    assert len(sites) == len(site_amax), (
        f"walk order out of sync: {len(sites)} sites vs "
        f"{len(site_amax)} recorded activations"
    )

    # non-mutating injection: rebuild the nested structure with "a_s" leaves
    flat = dict(zip([id(s) for s in sites], site_amax))

    def rebuild(node):
        if isinstance(node, dict):
            new = {k: rebuild(v) for k, v in node.items()}
            if id(node) in flat:
                new["a_s"] = jnp.asarray(flat[id(node)], jnp.float32)
            return new
        if isinstance(node, list):
            return [rebuild(v) for v in node]
        return node

    return rebuild(params)
