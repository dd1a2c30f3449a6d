"""Public API: load_model / encode / decode / compress / decompress
(SURVEY.md §3 #9; BASELINE.json:5 "public encode/decode/compress API").

Host<->device boundaries follow SURVEY.md §4.1-4.2: waveforms go host->TPU
once per call, only int32 indices cross back on encode, and bit-packing is
host-side numpy. Compiled graphs are cached by (model config, depth, padded
length) through jax.jit's static-argument cache — the model object is a
frozen dataclass, so it IS the cache key.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu import bitstream
from nsc_tpu.configs import CodecConfig, get_config, list_configs
from nsc_tpu.models.codec import NeuralSpeechCodec, init_codec

ArrayLike = Union[np.ndarray, jax.Array]


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """A loaded codec: static model + parameter/quantizer pytrees."""

    model: NeuralSpeechCodec
    params: dict
    rvq: dict

    @property
    def cfg(self) -> CodecConfig:
        return self.model.cfg


def list_models() -> tuple:
    return list_configs()


def serving_config(cfg: CodecConfig) -> CodecConfig:
    """The measured-fastest TPU serving configuration (docs/PERFORMANCE.md):
    bf16 compute, fused Pallas RVQ, CT-layout fused residual stages, and the
    polynomial snake. All flags auto-fall back off-TPU. NOTE: snake_fast
    deviates from exact-sine snake by <8.1e-5 (under bf16 resolution) — on a
    snake-trained checkpoint ~98.5% of indices match the exact path; use the
    plain config when archival index stability across configs matters."""
    act = "snake_fast" if cfg.activation == "snake" else cfg.activation
    return dataclasses.replace(
        cfg,
        compute_dtype="bfloat16",
        rvq_backend="pallas",
        unit_backend="auto",
        activation=act,
    )


def load_model(
    name: str = "base",
    *,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    serving: bool = False,
) -> ModelBundle:
    """Build a codec by config name; optionally restore weights from an orbax
    checkpoint directory (as written by nsc_tpu.train). Without a checkpoint,
    weights are deterministic random init — no published reference
    checkpoints are reachable in this environment (SURVEY.md §0).
    serving=True applies serving_config() (fast TPU inference path)."""
    cfg = get_config(name)
    if serving:
        cfg = serving_config(cfg)
    model, params, rvq = init_codec(jax.random.PRNGKey(seed), cfg)
    if checkpoint is not None:
        from nsc_tpu.train.checkpoint import restore_inference

        params, rvq = restore_inference(checkpoint, params, rvq)
    return ModelBundle(model, params, rvq)


def quantize_model(
    bundle: ModelBundle, calibration_wavs=None, *, seconds: float = 2.0,
    per_channel: bool = False,
) -> ModelBundle:
    """Return an int8-serving bundle with STATICALLY calibrated activation
    scales (ops/quant.py): `calibration_wavs` (iterable of (N, T) float32
    arrays; defaults to a few synthetic speech-like batches) is run once
    eagerly, per-conv-site amax lands in the params as "a_s" leaves, and the
    compiled graph then has no dynamic amax passes. Quality impact is
    measured in tests/unit/test_quant.py; see docs/PERFORMANCE.md for when
    int8 wins (compute-bound variants) vs bf16 (memory-bound base config)."""
    from nsc_tpu.ops import quant as quant_lib

    cfg = dataclasses.replace(bundle.cfg, quant="int8")
    model = NeuralSpeechCodec(cfg)
    if calibration_wavs is None:
        from nsc_tpu.train.data import SyntheticSource

        src = SyntheticSource(cfg.sample_rate, seed=0)
        seg = max(cfg.hop, int(seconds * cfg.sample_rate) // cfg.hop * cfg.hop)
        it = src.batches(2, seg)
        calibration_wavs = [next(it) for _ in range(3)]
    params = quant_lib.calibrate_codec(
        model, bundle.params, bundle.rvq, calibration_wavs,
        per_channel=per_channel,
    )
    return ModelBundle(model, params, bundle.rvq)


# ---------------------------------------------------------------------------
# jitted cores (static: model, n_q; cached per padded length)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model", "n_q"))
def _encode_jit(model, params, rvq, wav, n_q):
    return model.encode(params, rvq, wav, n_q=n_q)


@functools.partial(jax.jit, static_argnames=("model", "n_q"))
def _decode_jit(model, params, rvq, indices, n_q):
    return model.decode(params, rvq, indices, n_q=n_q)


@functools.partial(jax.jit, static_argnames=("model", "n_q"))
def _reconstruct_jit(model, params, rvq, wav, n_q):
    return model.reconstruct(params, rvq, wav, n_q=n_q)


def _pad_to_hop(wav: np.ndarray, hop: int) -> np.ndarray:
    t = wav.shape[-1]
    pad = (-t) % hop
    if pad:
        wav = np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
    return wav


_MIN_BUCKET_FRAMES = 64


def _pad_to_bucket(wav: np.ndarray, hop: int) -> np.ndarray:
    """Pad to a power-of-two frame count so arbitrary input lengths hit a
    handful of compiled programs instead of one per length (SURVEY.md §8
    hard-part #7 'bucket lengths'). Only valid for CAUSAL configs: trailing
    zeros cannot influence earlier frames there, so after trimming the extra
    frames the result matches the tight-padded computation (indices tested
    bit-identical across bucket edges; decoded waveforms agree to 1 ulp —
    XLA's shape-dependent fusions reorder float ops at that level)."""
    t = wav.shape[-1]
    frames = (t + hop - 1) // hop
    bucket = max(_MIN_BUCKET_FRAMES, 1 << (frames - 1).bit_length())
    pad = bucket * hop - t
    if pad:
        wav = np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
    return wav


def _as_batch(wav: ArrayLike) -> tuple[np.ndarray, bool]:
    arr = np.asarray(wav, dtype=np.float32)
    if arr.ndim == 1:
        return arr[None], True
    if arr.ndim == 2:
        return arr, False
    raise ValueError(f"expected (T,) or (N, T) waveform, got {arr.shape}")


# ---------------------------------------------------------------------------
# public functions
# ---------------------------------------------------------------------------


def codebook_fingerprint(rvq: dict) -> int:
    """u32 CRC-32 of the RVQ codebooks. Streams carry this in their header
    (bitstream.FLAG_FINGERPRINT) so a stream from one checkpoint can't be
    silently decoded by a same-config model with DIFFERENT codebooks. The
    CRC is taken over the float32 canonical form of the codebooks as loaded
    (serving-path dtype casts happen later, inside ops), so serving and
    parity bundles of the same checkpoint agree."""
    import zlib

    cb = np.ascontiguousarray(np.asarray(rvq["codebooks"], np.float32))
    return zlib.crc32(cb.tobytes()) & 0xFFFFFFFF


def encode(
    bundle: ModelBundle, wav: ArrayLike, n_q: Optional[int] = None
) -> np.ndarray:
    """Waveform -> codebook indices. (T,) -> (F, n_q); (N, T) -> (N, F, n_q)."""
    batch, single = _as_batch(wav)
    t = batch.shape[-1]
    cfg = bundle.cfg
    if cfg.causal:
        batch = _pad_to_bucket(batch, cfg.hop)
    else:
        # non-causal 'same' padding: trailing zeros leak into the final
        # frames' receptive fields, so pad tightly (one program per length)
        batch = _pad_to_hop(batch, cfg.hop)
    idx = _encode_jit(bundle.model, bundle.params, bundle.rvq, jnp.asarray(batch), n_q)
    frames = (t + cfg.hop - 1) // cfg.hop
    idx = np.asarray(idx)[:, :frames]
    return idx[0] if single else idx


def decode(
    bundle: ModelBundle, indices: ArrayLike, n_q: Optional[int] = None
) -> np.ndarray:
    """Codebook indices -> waveform. (F, n_q) -> (F*hop,); batched likewise."""
    idx = np.asarray(indices, dtype=np.int32)
    single = idx.ndim == 2
    if single:
        idx = idx[None]
    frames = idx.shape[1]
    if bundle.cfg.causal and frames:
        # frame-bucketing, mirroring encode(): trailing pad frames cannot
        # affect earlier output samples of a causal decoder; trim after
        bucket = max(_MIN_BUCKET_FRAMES, 1 << (frames - 1).bit_length())
        if bucket != frames:
            idx = np.pad(idx, ((0, 0), (0, bucket - frames), (0, 0)))
    wav = _decode_jit(bundle.model, bundle.params, bundle.rvq, jnp.asarray(idx), n_q)
    wav = np.asarray(wav, dtype=np.float32)[:, : frames * bundle.cfg.hop]
    return wav[0] if single else wav


def compress(
    bundle: ModelBundle,
    wav: ArrayLike,
    n_q: Optional[int] = None,
    *,
    entropy_coding: bool = False,
) -> bytes:
    """(T,) waveform -> serialized NSC bitstream (header + index planes).

    entropy_coding=True arithmetic-codes the planes (nsc_tpu/entropy.py) —
    smaller streams for trained codebooks; decompress auto-detects."""
    arr = np.asarray(wav, dtype=np.float32)
    if arr.ndim != 1:
        raise ValueError("compress takes a single (T,) waveform")
    idx = encode(bundle, arr, n_q=n_q)
    return _finalize_stream(bundle, idx, arr.shape[0], entropy_coding)


def _finalize_stream(
    bundle: ModelBundle, idx: np.ndarray, orig_len: int, entropy_coding: bool
) -> bytes:
    """Header + planes for `idx`, with an entropy->raw size fallback.

    Post-refit codebooks are near-uniform (mean usage ~100%, perplexity
    ~960/1024 — docs/refit_report.json), so the adaptive coder's per-plane
    overhead can EXPAND the stream past fixed-width packing. The flag lives
    in the header, so emitting whichever serialization is smaller is
    transparent to decompress (it auto-detects; tested in
    tests/unit/test_bitstream.py::test_entropy_raw_fallback)."""
    cfg = bundle.cfg

    def _stream(flags: int) -> bytes:
        header = bitstream.BitstreamHeader(
            model_name=cfg.name,
            bits=cfg.bits_per_codebook,
            n_q=idx.shape[-1],
            sample_rate=cfg.sample_rate,
            hop=cfg.hop,
            num_frames=idx.shape[0],
            orig_len=orig_len,
            flags=flags,
            fingerprint=codebook_fingerprint(bundle.rvq),
        )
        return bitstream.serialize(header, idx)

    raw = _stream(bitstream.FLAG_FINGERPRINT)
    if not entropy_coding:
        return raw
    coded = _stream(bitstream.FLAG_FINGERPRINT | bitstream.FLAG_ENTROPY)
    return coded if len(coded) < len(raw) else raw


def _check_stream_identity(bundle: ModelBundle, header) -> None:
    """Reject a stream the loaded model cannot faithfully decode."""
    cfg = bundle.cfg
    # Identity must match fully: distinct models can share sr/hop (and even
    # bits-per-book), but their codebooks differ, so a foreign stream would
    # decode to garbage silently. The header carries name + bits; check all.
    if (
        header.hop != cfg.hop
        or header.sample_rate != cfg.sample_rate
        or header.bits != cfg.bits_per_codebook
        or header.model_name != cfg.name
    ):
        raise ValueError(
            f"bitstream was made by model {header.model_name!r} "
            f"(sr={header.sample_rate}, hop={header.hop}, bits={header.bits}); "
            f"loaded model {cfg.name!r} (sr={cfg.sample_rate}, hop={cfg.hop}, "
            f"bits={cfg.bits_per_codebook}) is incompatible"
        )
    # config identity is necessary but not sufficient: two checkpoints of the
    # same config differ in codebooks and decode each other's streams to
    # garbage. Streams written by this package carry a codebook CRC.
    if header.flags & bitstream.FLAG_FINGERPRINT:
        have = codebook_fingerprint(bundle.rvq)
        if header.fingerprint != have:
            raise bitstream.BitstreamError(
                f"codebook fingerprint mismatch: stream was encoded with "
                f"codebooks {header.fingerprint:#010x}, loaded model has "
                f"{have:#010x} (same config, different checkpoint?)"
            )


def decompress(
    bundle: ModelBundle, blob: bytes, n_q: Optional[int] = None
) -> np.ndarray:
    """Serialized bitstream -> (orig_len,) waveform."""
    header, idx = bitstream.deserialize(blob, max_n_q=n_q)
    _check_stream_identity(bundle, header)
    wav = decode(bundle, idx)
    return wav[: header.orig_len]


def streaming_compress(
    bundle: ModelBundle,
    wav: ArrayLike,
    chunk_seconds: float = 1.0,
    n_q: Optional[int] = None,
    *,
    entropy_coding: bool = False,
    queue_chunks: int = 4,
) -> bytes:
    """compress() through the stateful chunked encoder (SURVEY.md §3 #10,
    BASELINE.json:8): bounded memory for arbitrarily long inputs, indices
    bit-identical to batch compress of the same audio (tested in
    tests/integration/test_streaming.py). Requires a causal config.

    queue_chunks: chunks encoded per device dispatch (StreamingEncoder.
    push_many). File-level compression is throughput-bound, not
    latency-bound, and the per-program dispatch overhead on a relay-tunneled
    rig (~28 ms) dominates 1 s chunks — queuing 4 lifted end-to-end
    streaming RTF from ~483x to over the 500x bar (VERDICT r4 #6;
    bench_suite config 2). Set 1 for strict chunk-at-a-time behavior
    (interactive latency); indices are bit-identical either way (the carried
    state evolves identically — tested)."""
    from nsc_tpu.streaming import StreamingEncoder

    arr = np.asarray(wav, dtype=np.float32)
    if arr.ndim != 1:
        raise ValueError("streaming_compress takes a single (T,) waveform")
    cfg = bundle.cfg
    chunk = max(cfg.hop, int(chunk_seconds * cfg.sample_rate) // cfg.hop * cfg.hop)
    padded = np.pad(arr, (0, (-len(arr)) % cfg.hop))
    enc = StreamingEncoder(bundle.model, bundle.params, bundle.rvq, n_q=n_q)
    chunks = [padded[i : i + chunk] for i in range(0, len(padded), chunk)]
    group = max(1, int(queue_chunks))
    blocks: list = []
    for g in range(0, len(chunks), group):
        blocks.extend(enc.push_many(chunks[g : g + group]))
    idx = np.concatenate(blocks, axis=0)
    return _finalize_stream(bundle, idx, arr.shape[0], entropy_coding)


def streaming_decompress(
    bundle: ModelBundle,
    blob: bytes,
    chunk_seconds: float = 1.0,
    n_q: Optional[int] = None,
    *,
    queue_chunks: int = 4,
) -> np.ndarray:
    """decompress() through the stateful chunked decoder: bounded memory for
    arbitrarily long streams. Chunks have a fixed frame count (one compiled
    program); the final partial chunk is zero-padded and trimmed — trailing
    pad frames cannot affect earlier samples of a causal decoder.
    queue_chunks: index blocks decoded per device dispatch (push_many) —
    same throughput rationale as streaming_compress; 1 = chunk-at-a-time."""
    from nsc_tpu.streaming import StreamingDecoder

    header, idx = bitstream.deserialize(blob, max_n_q=n_q)
    _check_stream_identity(bundle, header)
    cfg = bundle.cfg
    fpc = max(1, int(chunk_seconds * cfg.sample_rate) // cfg.hop)
    dec = StreamingDecoder(bundle.model, bundle.params, bundle.rvq, n_q=n_q)
    blocks, gots = [], []
    for s in range(0, idx.shape[0], fpc):
        c = idx[s : s + fpc]
        gots.append(c.shape[0])
        if c.shape[0] < fpc:
            c = np.pad(c, ((0, fpc - c.shape[0]), (0, 0)))
        blocks.append(c)
    group = max(1, int(queue_chunks))
    parts = []
    for g in range(0, len(blocks), group):
        outs = dec.push_many(blocks[g : g + group])
        for out, got in zip(outs, gots[g : g + group]):
            parts.append(out[: got * cfg.hop])
    wav = np.concatenate(parts, axis=0) if parts else np.zeros(0, np.float32)
    return np.asarray(wav, np.float32)[: header.orig_len]
