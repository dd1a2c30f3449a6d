"""Streaming chunked encode/decode (SURVEY.md §3 #10, §4.5; BASELINE.json:8
"streaming chunked encode").

Correctness contract: streaming over chunks produces EXACTLY the same
codebook indices as batch encode of the concatenated audio (tested in
tests/integration/test_streaming.py). This is the codec-family analog of
context parallelism (SURVEY.md §6 long-context row): arbitrarily long audio
in bounded memory.

Mechanics:
  * every causal conv carries its left receptive field ((K-1)*dilation input
    samples at that layer's rate) as explicit state; zero-init state ==
    batch mode's zero left-padding, which is what makes the equality exact.
  * strided layers stay aligned because chunk lengths are multiples of the
    hop, so each layer's chunk is divisible by its stride.
  * transposed convs (streaming decode) carry a (K - stride)-sample
    overlap-add tail of pre-bias partial sums.

The per-chunk step is a pure jitted function (state, chunk) -> (state, out):
device-resident state, one host->device transfer per chunk (SURVEY.md §4.5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nsc_tpu.configs import CodecConfig
from nsc_tpu.models.codec import NeuralSpeechCodec
from nsc_tpu.ops import conv as C
from nsc_tpu.ops import rvq as rvq_ops

State = Dict[str, Any]


# ---------------------------------------------------------------------------
# stateful conv primitives
# ---------------------------------------------------------------------------


def _ctx_len(params, dilation: int) -> int:
    k = (params["v"] if "v" in params else params["w"]).shape[0]
    return (k - 1) * dilation


def conv1d_init_state(
    params, n: int, dilation: int = 1, dtype=jnp.float32
) -> Optional[jax.Array]:
    ctx = _ctx_len(params, dilation)
    if ctx == 0:
        return None
    in_ch = (params["v"] if "v" in params else params["w"]).shape[1]
    return jnp.zeros((n, ctx, in_ch), dtype)


def conv1d_stream(
    x: jax.Array, params, state: Optional[jax.Array], *,
    stride: int = 1, dilation: int = 1,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Causal conv over one chunk with carried left context. Chunk length must
    be a multiple of `stride`."""
    if state is None:
        return C.conv1d(x, params, stride=stride, dilation=dilation,
                        padding="valid"), None
    xx = jnp.concatenate([state.astype(x.dtype), x], axis=1)
    y = C.conv1d(xx, params, stride=stride, dilation=dilation, padding="valid")
    ctx = state.shape[1]
    return y, xx[:, -ctx:, :]


def conv_transpose1d_init_state(
    params, n: int, stride: int, dtype=jnp.float32
) -> Optional[jax.Array]:
    k = (params["v"] if "v" in params else params["w"]).shape[0]
    tail = k - stride
    if tail <= 0:
        return None
    out_ch = (params["v"] if "v" in params else params["w"]).shape[2]
    return jnp.zeros((n, tail, out_ch), dtype)


def conv_transpose1d_stream(
    x: jax.Array, params, state: Optional[jax.Array], *, stride: int
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Causal transposed conv over one chunk with overlap-add tail carry."""
    w = C.materialize_weight(params)
    k = w.shape[0]
    # full VALID transposed conv, pre-bias: length (T-1)*stride + k
    y_full = jax.lax.conv_general_dilated(
        x, jnp.flip(w, axis=0).astype(x.dtype),
        window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    t_out = x.shape[1] * stride
    if state is not None:
        tail = state.shape[1]
        y_full = y_full.at[:, :tail, :].add(state.astype(y_full.dtype))
        new_state = y_full[:, t_out : t_out + tail, :]
    else:
        new_state = None
    y = y_full[:, :t_out, :]
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y, new_state


# ---------------------------------------------------------------------------
# streaming encoder (mirrors seanet.apply_encoder exactly)
# ---------------------------------------------------------------------------


def _unit_init_state(p, n, dilation, cfg, dtype=jnp.float32):
    return {
        "conv1": conv1d_init_state(p["conv1"], n, dilation, dtype=dtype),
        "conv2": conv1d_init_state(p["conv2"], n, dtype=dtype),
    }


def _unit_stream(p, st, x, dilation, cfg):
    h = C.activation(cfg.activation, x, p["act1"])
    h, s1 = conv1d_stream(h, p["conv1"], st["conv1"], dilation=dilation)
    h = C.activation(cfg.activation, h, p["act2"])
    h, s2 = conv1d_stream(h, p["conv2"], st["conv2"])
    return x + h, {"conv1": s1, "conv2": s2}


def encoder_init_state(
    params, cfg: CodecConfig, n: int, dtype=None
) -> State:
    # state dtype MUST match what the jitted step returns (the compute
    # dtype), or the second push() triggers a full recompile — caught as a
    # phantom 10x "first chunk" latency in bench_suite config 2
    dt = jnp.dtype(cfg.compute_dtype) if dtype is None else dtype
    st: State = {"stem": conv1d_init_state(params["stem"], n, dtype=dt)}
    stages = []
    for stage, _ in zip(params["stages"], cfg.strides):
        stages.append(
            {
                "units": [
                    _unit_init_state(u, n, d, cfg, dt)
                    for u, d in zip(stage["units"], cfg.dilations)
                ],
                "down": conv1d_init_state(stage["down"], n, dtype=dt),
            }
        )
    st["stages"] = stages
    st["final"] = conv1d_init_state(params["final"], n, dtype=dt)
    return st


def encoder_stream(
    params, state: State, chunk: jax.Array, cfg: CodecConfig
) -> Tuple[jax.Array, State]:
    """One chunk (N, T, 1), T % hop == 0 -> ((N, T/hop, D) latents, state')."""
    h, s_stem = conv1d_stream(chunk, params["stem"], state["stem"])
    new_stages = []
    for stage, st_stage, stride in zip(params["stages"], state["stages"], cfg.strides):
        new_units = []
        for unit, st_u, dil in zip(stage["units"], st_stage["units"], cfg.dilations):
            h, s_u = _unit_stream(unit, st_u, h, dil, cfg)
            new_units.append(s_u)
        h = C.activation(cfg.activation, h, stage["down_act"])
        h, s_down = conv1d_stream(h, stage["down"], st_stage["down"], stride=stride)
        new_stages.append({"units": new_units, "down": s_down})
    h = C.activation(cfg.activation, h, params["final_act"])
    z, s_final = conv1d_stream(h, params["final"], state["final"])
    return z, {"stem": s_stem, "stages": new_stages, "final": s_final}


# ---------------------------------------------------------------------------
# streaming decoder (mirrors seanet.apply_decoder; requires cfg.causal)
# ---------------------------------------------------------------------------


def decoder_init_state(
    params, cfg: CodecConfig, n: int, dtype=None
) -> State:
    dt = jnp.dtype(cfg.compute_dtype) if dtype is None else dtype
    st: State = {"stem": conv1d_init_state(params["stem"], n, dtype=dt)}
    stages = []
    for stage, stride in zip(params["stages"], reversed(cfg.strides)):
        stages.append(
            {
                "up": conv_transpose1d_init_state(
                    stage["up"], n, stride, dtype=dt
                ),
                "units": [
                    _unit_init_state(u, n, d, cfg, dt)
                    for u, d in zip(stage["units"], cfg.dilations)
                ],
            }
        )
    st["stages"] = stages
    st["final"] = conv1d_init_state(params["final"], n, dtype=dt)
    return st


def decoder_stream(
    params, state: State, z: jax.Array, cfg: CodecConfig
) -> Tuple[jax.Array, State]:
    """(N, F, D) latent chunk -> ((N, F*hop, 1) waveform, state')."""
    h, s_stem = conv1d_stream(z, params["stem"], state["stem"])
    new_stages = []
    for stage, st_stage, stride in zip(
        params["stages"], state["stages"], reversed(cfg.strides)
    ):
        h = C.activation(cfg.activation, h, stage["up_act"])
        h, s_up = conv_transpose1d_stream(h, stage["up"], st_stage["up"], stride=stride)
        new_units = []
        for unit, st_u, dil in zip(stage["units"], st_stage["units"], cfg.dilations):
            h, s_u = _unit_stream(unit, st_u, h, dil, cfg)
            new_units.append(s_u)
        new_stages.append({"up": s_up, "units": new_units})
    h = C.activation(cfg.activation, h, params["final_act"])
    h, s_final = conv1d_stream(h, params["final"], state["final"])
    return jnp.tanh(h), {"stem": s_stem, "stages": new_stages, "final": s_final}


# ---------------------------------------------------------------------------
# user-facing streaming sessions
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model", "n_q"))
def _encode_chunk_jit(model, params, rvq, state, chunk, n_q):
    z, new_state = encoder_stream(params["encoder"], state, chunk, model.cfg)
    z = model._project_in(params, z)  # factorized codes (identity otherwise)
    idx = rvq_ops.quantize(rvq, z, n_q=n_q)
    return idx, new_state


@functools.partial(jax.jit, static_argnames=("model", "n_q"))
def _decode_chunk_jit(model, params, rvq, state, idx, n_q):
    z = rvq_ops.dequantize(rvq, idx, n_q=n_q)
    z = model._project_out(params, z).astype(model.compute_dtype)
    wav, new_state = decoder_stream(params["decoder"], state, z, model.cfg)
    return wav[..., 0], new_state


@dataclasses.dataclass
class StreamingEncoder:
    """Stateful chunked encoder. Feed (N, T) chunks with T % hop == 0; indices
    are identical to batch encode of the concatenation."""

    model: NeuralSpeechCodec
    params: dict
    rvq: dict
    n_q: Optional[int] = None
    _state: Any = None
    _batch: int = 1

    def __post_init__(self):
        if not self.model.cfg.causal:
            raise ValueError("streaming requires a causal model config")

    def reset(self, batch_size: int = 1) -> None:
        self._batch = batch_size
        self._state = encoder_init_state(
            self.params["encoder"], self.model.cfg, batch_size
        )

    def push(self, chunk) -> jax.Array:
        """(N, T) or (T,) chunk -> (N, T/hop, n_q) indices."""
        import numpy as np

        arr = jnp.asarray(chunk, dtype=self.model.compute_dtype)
        single = arr.ndim == 1
        if single:
            arr = arr[None]
        if self._state is None:
            self.reset(arr.shape[0])
        cfg = self.model.cfg
        if arr.shape[1] % cfg.hop:
            raise ValueError(
                f"chunk length {arr.shape[1]} not a multiple of hop {cfg.hop}"
            )
        idx, self._state = _encode_chunk_jit(
            self.model, self.params, self.rvq, self._state, arr[..., None], self.n_q
        )
        return np.asarray(idx)[0] if single else np.asarray(idx)

    def push_many(self, chunks) -> list:
        """Queue several chunks and encode them in ONE device dispatch;
        returns one (N, T_i/hop, n_q) index block per input chunk.

        Exactness makes this free: streaming(concat) == sequential pushes
        (the carried state evolves identically), so queuing k chunks into a
        single push amortizes the fixed per-program dispatch overhead
        (~28 ms on the relay-tunneled rig — docs/PERFORMANCE.md) over k
        chunks. Use when throughput matters more than per-chunk latency
        (VERDICT r3 #6: the remaining streaming-RTF lever)."""
        import numpy as np

        chunks = [np.asarray(c) for c in chunks]
        if not chunks:
            return []
        hop = self.model.cfg.hop
        lens = [c.shape[-1] for c in chunks]
        # EVERY chunk must be hop-aligned, exactly as sequential push()es
        # would enforce: only the concatenated total hits push's check, and
        # an unaligned interior chunk would silently shift every later
        # chunk's frame slice (ln // hop under-counts) and drop frames.
        bad = [ln for ln in lens if ln % hop]
        if bad:
            raise ValueError(
                f"chunk length {bad[0]} not a multiple of hop {hop}"
            )
        idx = self.push(np.concatenate(chunks, axis=-1))
        out, f0 = [], 0
        for ln in lens:
            f1 = f0 + ln // hop
            out.append(idx[..., f0:f1, :])
            f0 = f1
        return out


@dataclasses.dataclass
class StreamingDecoder:
    """Stateful chunked decoder (symmetric to StreamingEncoder)."""

    model: NeuralSpeechCodec
    params: dict
    rvq: dict
    n_q: Optional[int] = None
    _state: Any = None

    def __post_init__(self):
        if not self.model.cfg.causal:
            raise ValueError("streaming requires a causal model config")

    def reset(self, batch_size: int = 1) -> None:
        self._state = decoder_init_state(
            self.params["decoder"], self.model.cfg, batch_size
        )

    def push(self, indices) -> jax.Array:
        import numpy as np

        idx = jnp.asarray(indices, dtype=jnp.int32)
        single = idx.ndim == 2
        if single:
            idx = idx[None]
        if self._state is None:
            self.reset(idx.shape[0])
        wav, self._state = _decode_chunk_jit(
            self.model, self.params, self.rvq, self._state, idx, self.n_q
        )
        return np.asarray(wav)[0] if single else np.asarray(wav)

    def push_many(self, index_blocks) -> list:
        """Symmetric to StreamingEncoder.push_many: decode several index
        blocks in ONE dispatch; returns one waveform chunk per block."""
        import numpy as np

        blocks = [np.asarray(b) for b in index_blocks]
        if not blocks:
            return []
        hop = self.model.cfg.hop
        frames = [b.shape[-2] for b in blocks]
        wav = self.push(np.concatenate(blocks, axis=-2))
        out, t0 = [], 0
        for f in frames:
            t1 = t0 + f * hop
            out.append(wav[..., t0:t1])
            t0 = t1
        return out
