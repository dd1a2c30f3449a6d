"""SEANet-style convolutional encoder/decoder stacks (SURVEY.md §3 #4-5;
BASELINE.json:5 "strided 1D-conv encoder/decoder stacks" with "causal/dilated
conv blocks").

Structure (canonical for the SoundStream/EnCodec/DAC family the contract
describes — SURVEY.md §1):

  Encoder: stem conv -> [residual units (dilated) + strided down-conv] per
  stage (channels double) -> final conv to latent_dim. Overall hop =
  prod(strides) (320 -> 50 Hz latent frames at 16 kHz for the base config).

  Decoder: exact mirror with transposed strided convs.

All convs are causal when cfg.causal (required for streaming encode,
BASELINE.json:8). Stages are unrolled at trace time (static shapes; channel
widths differ per stage so lax.scan doesn't apply) — XLA sees one flat graph
and fuses activations into the convs.

Params are nested dict pytrees; construction order defines the torch
checkpoint name-mapping (nsc_tpu/compat/torch_compat.py).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from nsc_tpu.configs import CodecConfig
from nsc_tpu.ops import conv as C
from nsc_tpu.ops import fastconv as FC

Params = Dict[str, Any]


def _conv(
    cfg: CodecConfig, x: jax.Array, p: Params, *,
    stride: int = 1, dilation: int = 1, padding: str = "causal",
) -> jax.Array:
    """Backend dispatch: reference lax.conv, MXU-stacked matmul (exact), or
    int8 W8A8 (quantized serving path)."""
    if cfg.quant == "int8":
        from nsc_tpu.ops import quant as Q

        return Q.conv1d_int8(
            x, p, stride=stride, dilation=dilation, padding=padding
        )
    if cfg.conv_backend == "stacked" and padding == "causal":
        return FC.stacked_conv1d(
            x, p, stride=stride, dilation=dilation, stack=cfg.conv_stack
        )
    return C.conv1d(x, p, stride=stride, dilation=dilation, padding=padding)


def _conv_transpose(
    cfg: CodecConfig, x: jax.Array, p: Params, *, stride: int
) -> jax.Array:
    if cfg.quant == "int8" and cfg.causal:
        from nsc_tpu.ops import quant as Q

        return Q.conv_transpose1d_int8(x, p, stride=stride)
    if cfg.conv_backend == "stacked" and cfg.causal:
        return FC.polyphase_conv_transpose1d(x, p, stride=stride)
    return C.conv_transpose1d(x, p, stride=stride, causal=cfg.causal)


def _act(cfg: CodecConfig, x: jax.Array, p) -> jax.Array:
    """Standalone activation sites (down_act / up_act / final_act): plain
    XLA on purpose. Both "optimizations" were measured SLOWER end-to-end
    (docs/PERFORMANCE.md r2): a standalone CT Pallas snake pass costs an
    extra HBM round trip + layout copies (+32 ms), and fusing these as the
    unit-stack kernel's tail costs +10 ms because the XLA snake here doubles
    as a free layout converter between the kernel's {2,1,0} output and the
    strided conv's preferred {0,2,1} input — fused away, that conversion
    becomes a raw full-tensor copy."""
    return C.activation(cfg.activation, x, p)


def _ct_stage_supported(cfg: CodecConfig) -> bool:
    """Structural support gate for the CT stage kernels: the kernel hardcodes
    k=3 dilated conv1 + k=1 conv2 and carries sum(2*d) lanes of left context
    in a fixed CARRY_CT-wide VMEM scratch, so any config outside that (e.g.
    dilations (1,3,9,27,81) => halo 242 > 128, or residual_kernel != 3) must
    fall back to the reference ops instead of hitting the kernel's assert
    (ADVICE r2 medium)."""
    from nsc_tpu.ops.pallas import residual_stack as RS

    return (
        cfg.residual_kernel == 3
        and sum(2 * d for d in cfg.dilations) <= RS.CARRY_CT
    )


def _unit_stack(
    cfg: CodecConfig, h: jax.Array, units, padding: str
) -> jax.Array:
    """All residual units of one stage; whole-stage Pallas kernel when
    enabled (memory-bound ops fused into one VMEM pass).

    unit_backend:
      "reference"    — per-op XLA (parity default; clean VJPs for training).
      "pallas_ct"    — channels-on-sublanes fused stage kernel: 2.5x faster
        than XLA at stage-1 size (38 vs 96 ms at bench scale) because every
        op runs full-lane and the conv<->fusion layout flips XLA inserts
        around the snake polynomial never happen (docs/PERFORMANCE.md r2).
      "auto"         — pallas_ct wherever supported (serving default path).
      "pallas_fused" — the (T, C) lane-padded variant (kept for comparison;
        loses at narrow C — docs/PERFORMANCE.md r1)."""
    c = h.shape[-1]
    snakeish = cfg.activation in ("snake", "snake_fast")
    on_tpu = jax.default_backend() == "tpu"
    min_c = 16 if h.dtype == jnp.bfloat16 else 8
    ct_ok = c >= min_c and c % min_c == 0
    if (
        (cfg.unit_backend == "pallas_ct" or cfg.unit_backend == "auto")
        and ct_ok and snakeish and padding == "causal"
        and cfg.quant == "none" and on_tpu
        and _ct_stage_supported(cfg)
    ):
        from nsc_tpu.ops.pallas import residual_stack as RS

        packed = RS.pack_stage_params(units, cfg)
        out = RS.residual_stack_ct_pallas(
            jnp.swapaxes(h, 1, 2), *packed, dilations=tuple(cfg.dilations),
            fast_act=(cfg.activation == "snake_fast"),
        )
        return jnp.swapaxes(out, 1, 2)
    if (
        cfg.unit_backend == "pallas_fused"
        and snakeish and padding == "causal"
        and cfg.quant == "none" and on_tpu
        and cfg.residual_kernel == 3
    ):
        from nsc_tpu.ops.pallas import residual_stack as RS

        packed = RS.pack_stage_params(units, cfg)
        return RS.residual_stack_pallas(
            h, *packed, dilations=tuple(cfg.dilations),
            fast_act=(cfg.activation == "snake_fast"),
        )
    for unit, dil in zip(units, cfg.dilations):
        h = _apply_residual_unit(unit, h, dil, cfg, padding)
    return h


def _fused_boundary_mode(cfg: CodecConfig, dtype) -> str | None:
    """Boundary-fused whole-codec path (ops/pallas/residual_stack.py
    fused_stage_ct_pallas): the stage kernels also absorb the encoder's
    down_act+down convs (phase-decomposed head) and the decoder's
    up_act+up transposed convs (phase-major tail), so activations stay in
    the CT layout across the whole stack and the per-boundary XLA layout
    flips disappear. Returns "compiled", "interpret", or None (unsupported).

    MEASURED (r2b, docs/PERFORMANCE.md): a wash at stride-2 boundaries and a
    net LOSS end-to-end (2382x vs 2835x RTF) — the phase-decomposition lane
    shuffle the head needs (and the de-interleave the tail needs) is a
    full-tensor lane permutation costing as much as the XLA layout flips it
    removes. Kept as an explicit opt-in for future hardware; "auto" uses the
    scratch-carry stage kernels + XLA boundaries instead.
    """
    if cfg.unit_backend != "pallas_ct_fused":
        return None
    if not (
        cfg.causal
        and cfg.activation in ("snake", "snake_fast")
        and cfg.quant == "none"
        and cfg.conv_backend == "reference"
    ):
        return None
    min_c = 16 if dtype == jnp.bfloat16 else 8
    widths = _stage_widths(cfg) + [encoder_final_width(cfg)]
    if not all(w >= min_c and w % min_c == 0 for w in widths):
        return None
    if not _ct_stage_supported(cfg):
        return None
    if jax.default_backend() == "tpu":
        return "compiled"
    # off-TPU the explicit opt-in runs via the Pallas interpreter (slow;
    # used by the CPU parity tests)
    return "interpret"


def _apply_encoder_fused(
    p: Params, h: jax.Array, cfg: CodecConfig, interpret: bool
) -> jax.Array:
    """Post-stem encoder with boundary-fused stage kernels. The final
    down/act/final conv stay XLA: they run at 1/40th the samples."""
    from nsc_tpu.ops.pallas import residual_stack as RS

    fast = cfg.activation == "snake_fast"
    hc = jnp.swapaxes(h, 1, 2)  # (B, C, T)
    for i, stage in enumerate(p["stages"]):
        if i == 0:
            head, s = None, 1
        else:
            prev = p["stages"][i - 1]
            s = cfg.strides[i - 1]
            head = RS.pack_head_params(
                prev["down_act"], prev["down"], s, hc.dtype
            )
        packed = RS.pack_stage_params(stage["units"], cfg)
        hc = RS.fused_stage_ct_pallas(
            hc, head, *packed, None,
            dilations=tuple(cfg.dilations), s_head=s,
            fast_act=fast, interpret=interpret,
        )
    h = jnp.swapaxes(hc, 1, 2)
    last = p["stages"][-1]
    h = _act(cfg, h, last["down_act"])
    h = _conv(cfg, h, last["down"], stride=cfg.strides[-1], padding="causal")
    h = _act(cfg, h, p["final_act"])
    return _conv(cfg, h, p["final"], padding="causal")


def _apply_decoder_fused(
    p: Params, z: jax.Array, cfg: CodecConfig, interpret: bool
) -> jax.Array:
    """Decoder with boundary-fused stage kernels (tail = next stage's
    up_act + transposed up conv). The stem and first up conv stay XLA:
    they run at 1/320th-1/40th the samples."""
    from nsc_tpu.ops.pallas import residual_stack as RS

    fast = cfg.activation == "snake_fast"
    strides_rev = tuple(reversed(cfg.strides))
    stages = p["stages"]
    h = _conv(cfg, z, p["stem"], padding="causal")
    h = _act(cfg, h, stages[0]["up_act"])
    h = _conv_transpose(cfg, h, stages[0]["up"], stride=strides_rev[0])
    hc = jnp.swapaxes(h, 1, 2)
    for i, stage in enumerate(stages):
        if i + 1 < len(stages):
            s = strides_rev[i + 1]
            tail = RS.pack_tail_params(
                stages[i + 1]["up_act"], stages[i + 1]["up"], s, hc.dtype
            )
        else:
            tail, s = None, 1
        packed = RS.pack_stage_params(stage["units"], cfg)
        hc = RS.fused_stage_ct_pallas(
            hc, None, *packed, tail,
            dilations=tuple(cfg.dilations), s_tail=s,
            fast_act=fast, interpret=interpret,
        )
    h = jnp.swapaxes(hc, 1, 2)
    h = _act(cfg, h, p["final_act"])
    h = _conv(cfg, h, p["final"], padding="causal")
    return jnp.tanh(h)


def _stage_widths(cfg: CodecConfig) -> List[int]:
    """Channel width entering each encoder stage; doubles per stage."""
    return [cfg.base_width * (2**i) for i in range(len(cfg.strides))]


def encoder_final_width(cfg: CodecConfig) -> int:
    return cfg.base_width * (2 ** len(cfg.strides))


# ---------------------------------------------------------------------------
# residual unit
# ---------------------------------------------------------------------------


def _init_residual_unit(
    key: jax.Array, ch: int, kernel: int, cfg: CodecConfig
) -> Params:
    k1, k2 = jax.random.split(key)
    wn = cfg.norm == "weight_norm"
    return {
        "act1": C.activation_init(cfg.activation, ch),
        "conv1": C.init_conv(k1, kernel, ch, ch, weight_norm=wn),
        "act2": C.activation_init(cfg.activation, ch),
        "conv2": C.init_conv(k2, 1, ch, ch, weight_norm=wn),
    }


def _apply_residual_unit(
    p: Params, x: jax.Array, dilation: int, cfg: CodecConfig, padding: str
) -> jax.Array:
    h = C.activation(cfg.activation, x, p["act1"])
    h = _conv(cfg, h, p["conv1"], dilation=dilation, padding=padding)
    h = C.activation(cfg.activation, h, p["act2"])
    h = _conv(cfg, h, p["conv2"], padding=padding)
    return x + h


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def init_encoder(key: jax.Array, cfg: CodecConfig) -> Params:
    wn = cfg.norm == "weight_norm"
    keys = jax.random.split(key, 2 + len(cfg.strides))
    params: Params = {
        "stem": C.init_conv(
            keys[0], cfg.stem_kernel, cfg.channels, cfg.base_width, weight_norm=wn
        )
    }
    stages = []
    for i, (stride, kk) in enumerate(zip(cfg.strides, keys[1:-1])):
        ch = cfg.base_width * (2**i)
        uks = jax.random.split(kk, len(cfg.dilations) + 1)
        units = [
            _init_residual_unit(uks[j], ch, cfg.residual_kernel, cfg)
            for j in range(len(cfg.dilations))
        ]
        stages.append(
            {
                "units": units,
                "down_act": C.activation_init(cfg.activation, ch),
                "down": C.init_conv(
                    uks[-1], 2 * stride, ch, 2 * ch, weight_norm=wn
                ),
            }
        )
    params["stages"] = stages
    params["final_act"] = C.activation_init(
        cfg.activation, encoder_final_width(cfg)
    )
    params["final"] = C.init_conv(
        keys[-1],
        cfg.last_kernel,
        encoder_final_width(cfg),
        cfg.latent_dim,
        weight_norm=wn,
    )
    return params


def apply_encoder(p: Params, x: jax.Array, cfg: CodecConfig) -> jax.Array:
    """(N, T, 1) waveform -> (N, T/hop, latent_dim) latents."""
    pad = "causal" if cfg.causal else "same"
    h = _conv(cfg, x, p["stem"], padding=pad)
    mode = _fused_boundary_mode(cfg, h.dtype)
    if mode is not None:
        return _apply_encoder_fused(p, h, cfg, interpret=(mode == "interpret"))
    for stage, stride in zip(p["stages"], cfg.strides):
        h = _unit_stack(cfg, h, stage["units"], pad)
        h = _act(cfg, h, stage["down_act"])
        h = _conv(cfg, h, stage["down"], stride=stride, padding=pad)
    h = _act(cfg, h, p["final_act"])
    return _conv(cfg, h, p["final"], padding=pad)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def init_decoder(key: jax.Array, cfg: CodecConfig) -> Params:
    wn = cfg.norm == "weight_norm"
    keys = jax.random.split(key, 2 + len(cfg.strides))
    width = encoder_final_width(cfg)
    params: Params = {
        "stem": C.init_conv(
            keys[0], cfg.last_kernel, cfg.latent_dim, width, weight_norm=wn
        )
    }
    stages = []
    for i, (stride, kk) in enumerate(zip(reversed(cfg.strides), keys[1:-1])):
        ch = width // (2**i)
        uks = jax.random.split(kk, len(cfg.dilations) + 1)
        stages.append(
            {
                "up_act": C.activation_init(cfg.activation, ch),
                "up": C.init_conv(
                    uks[-1], 2 * stride, ch, ch // 2, weight_norm=wn
                ),
                "units": [
                    _init_residual_unit(uks[j], ch // 2, cfg.residual_kernel, cfg)
                    for j in range(len(cfg.dilations))
                ],
            }
        )
    params["stages"] = stages
    params["final_act"] = C.activation_init(cfg.activation, cfg.base_width)
    params["final"] = C.init_conv(
        keys[-1], cfg.stem_kernel, cfg.base_width, cfg.channels, weight_norm=wn
    )
    return params


def apply_decoder(p: Params, z: jax.Array, cfg: CodecConfig) -> jax.Array:
    """(N, F, latent_dim) latents -> (N, F*hop, 1) waveform in (-1, 1)."""
    pad = "causal" if cfg.causal else "same"
    mode = _fused_boundary_mode(cfg, z.dtype)
    if mode is not None:
        return _apply_decoder_fused(p, z, cfg, interpret=(mode == "interpret"))
    h = _conv(cfg, z, p["stem"], padding=pad)
    for stage, stride in zip(p["stages"], reversed(cfg.strides)):
        h = _act(cfg, h, stage["up_act"])
        h = _conv_transpose(cfg, h, stage["up"], stride=stride)
        h = _unit_stack(cfg, h, stage["units"], pad)
    h = _act(cfg, h, p["final_act"])
    h = _conv(cfg, h, p["final"], padding=pad)
    return jnp.tanh(h)
