"""RTF benchmark (SURVEY.md §3 #20): batched encode+decode real-time factor.

Prints ONE JSON line:
  {"metric": "rtf_per_chip", "value": N, "unit": "x_realtime", "vs_baseline": N}

Metric definition (BASELINE.json:2): waveforms encoded+decoded per second per
chip, expressed as real-time factor at 16 kHz — (batch * seconds_of_audio) /
wall_seconds on one chip. The north-star (BASELINE.json:5) is >2000x on a
v5e-8 slice == 250x per chip for the linearly-scaling DP inference path, so
vs_baseline = rtf_per_chip / 250.

Config matches BASELINE.json:8: 64 x 16 kHz utterances, full RVQ depth.
Compile excluded (one warmup), bf16 compute, f32 RVQ distances (parity).
"""

import dataclasses
import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def flagship_key(d: str):
    """Deterministic 'newest flagship artifact' ordering: the training step
    recorded in meta.json first (lexicographic names lie — 'base_fast_9000' >
    'base_fast_30000' — and mtimes collapse to the checkout time on a fresh
    clone, ADVICE r3 + r4 review); at equal step, the LINEAGE depth — how
    many offline derivation passes (codebook refit, decoder finetune)
    produced the artifact — orders next, since each pass only exports on
    measured improvement (refit_flagship.py / finetune_flagship.py gates),
    so a deeper lineage dominates by construction (ADVICE r4 #3: a boolean
    refit flag tied refit-of-refit artifacts and fell back to mtime, which
    collapses to checkout time on a fresh clone); mtime last, as the
    tiebreak for meta-less dirs only."""
    try:
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)
        step = int(meta.get("step", -1))
        # artifacts exported before the lineage field: refit == lineage 1
        lineage = int(meta.get("lineage", 1 if meta.get("refit") else 0))
    except (OSError, ValueError, TypeError):  # missing/corrupt/null step
        step, lineage = -1, 0
    return (step, lineage, os.path.getmtime(d))


def _flagship():
    """The flagship serving bundle: the TRAINED base_fast checkpoint when the
    artifact exists (its trained activation IS the fast serving activation,
    so the headline path is the checkpoint's own parity lowering — VERDICT
    r2 item 1), random-init base_fast otherwise."""
    from nsc_tpu import api

    here = os.path.dirname(os.path.abspath(__file__))
    ckpts = glob.glob(os.path.join(here, "artifacts", "base_fast_*"))
    ckpt = max(ckpts, key=flagship_key) if ckpts else None
    cfg_name = "base_fast"
    if ckpt:
        try:
            with open(os.path.join(ckpt, "meta.json")) as f:
                cfg_name = json.load(f).get("config") or cfg_name
        except (OSError, ValueError):  # meta-less/corrupt dir: keep default
            pass
    bundle = api.load_model(cfg_name, checkpoint=ckpt, serving=True)
    return bundle, (os.path.relpath(ckpt, here) if ckpt else None)


def main() -> None:
    from nsc_tpu import api
    from nsc_tpu.utils.cache import enable_compilation_cache

    # Fail FAST if the relay's device claim is wedged (2026-08-17 incident:
    # jax.devices() hung indefinitely; a hung bench would eat the driver's
    # whole capture budget and record nothing actionable). Exit 97 with a
    # greppable marker instead — see docs/RUNBOOK.md "Relay wedge". Must run
    # BEFORE enable_compilation_cache: that calls jax.default_backend(),
    # which is itself the first (hangable) backend touch.
    from nsc_tpu.utils.liveness import device_liveness_check

    device_liveness_check()
    enable_compilation_cache()
    # Backends picked by measurement (docs/PERFORMANCE.md): native XLA convs
    # beat the matmul reformulations end-to-end (stacked pays HBM
    # transposes); fused Pallas RVQ for the quantizer; polynomial-sine snake
    # for the serving path — XLA's precise sin was 78% of runtime. The model
    # is TRAINED with snake_fast (configs/base.py::base_fast), so the fast
    # path needs no activation approximation at all.
    bundle, ckpt = _flagship()
    model, params, rvq = bundle.model, bundle.params, bundle.rvq
    cfg = bundle.cfg

    batch, seconds = 64, 10.0
    t = int(seconds * cfg.sample_rate)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(batch, t).astype(np.float32) * 0.1
    )

    # The jitted program returns a scalar checksum: under this environment's
    # remote-execution relay, block_until_ready returns before the device
    # finishes, so a host readback of a (tiny) result is the only reliable
    # completion barrier. The sum adds negligible work to the measured graph.
    fn = jax.jit(lambda p, q, w: jnp.sum(model.reconstruct(p, q, w)))
    float(fn(params, rvq, wav))  # compile + warmup excluded from timing

    # Synchronous RTF (diagnostic): one readback round-trip per dispatch, so
    # each iteration pays the rig's fixed ~28 ms dispatch overhead AND the
    # readback latency serially with the compute.
    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        checksum = float(fn(params, rvq, wav))
    wall_sync = (time.perf_counter() - start) / iters
    assert np.isfinite(checksum)

    # Headline: pipelined throughput. Enqueue `iters` programs back-to-back
    # and read back ONE scalar at the end — a single TPU device executes
    # programs in enqueue order, so the last checksum is a completion barrier
    # for all of them, and dispatch overhead overlaps device execution
    # instead of serializing with it. This is the sustained-serving number
    # the RTF metric (audio-seconds per wall-second per chip,
    # BASELINE.json:2) is about; the synchronous single-dispatch number
    # stays reported as `rtf_per_dispatch`.
    pipe_iters = 10
    start = time.perf_counter()
    outs = [fn(params, rvq, wav) for _ in range(pipe_iters)]
    checksum = float(outs[-1])
    wall_pipe = (time.perf_counter() - start) / pipe_iters
    assert np.isfinite(checksum)

    audio_seconds = batch * seconds
    rtf = audio_seconds / max(wall_pipe, 1e-9)
    rtf_sync = audio_seconds / max(wall_sync, 1e-9)

    # Index parity of the measured path. The headline flag follows the
    # canonical-index contract (nsc_tpu/canonical.py, VERDICT r3 #3): the
    # serving graph IS the codec, and `index_parity_exact` means the serving
    # path reproduces the indices PINNED at export time bit-identically on
    # this chip, this run — the determinism/stability property archival
    # decode actually needs. Two float-lowering match rates stay reported as
    # labeled tolerance diagnostics:
    # (a) serving path vs its own XLA reference lowering at the SAME serving
    #     dtype (the CT Pallas kernels are float-tolerance-equal BY DESIGN,
    #     so this is expected <1.0 — see docs/API.md);
    # (b) serving path vs the f32 archival parity path (cross-dtype
    #     stability; bf16 rounding near argmin ties).
    from nsc_tpu import canonical
    from nsc_tpu.models.codec import NeuralSpeechCodec

    here = os.path.dirname(os.path.abspath(__file__))
    if ckpt is not None:
        pin_exact, pin_rate, pin_status = canonical.check_pin(
            bundle, os.path.join(here, ckpt)
        )
    else:
        pin_exact, pin_rate, pin_status = None, 0.0, "no trained checkpoint"

    pw = wav[:8]
    ref_cfg = dataclasses.replace(
        cfg, unit_backend="reference", rvq_backend="xla"
    )
    f32_cfg = dataclasses.replace(ref_cfg, compute_dtype="float32")
    idx_serv = np.asarray(
        jax.jit(lambda p, q, w: model.encode(p, q, w))(params, rvq, pw)
    )
    idx_ref = np.asarray(
        jax.jit(
            lambda p, q, w: NeuralSpeechCodec(ref_cfg).encode(p, q, w)
        )(params, rvq, pw)
    )
    idx_f32 = np.asarray(
        jax.jit(
            lambda p, q, w: NeuralSpeechCodec(f32_cfg).encode(p, q, w)
        )(params, rvq, pw)
    )
    match_ref = float((idx_serv == idx_ref).mean())
    match_f32 = float((idx_serv == idx_f32).mean())

    # Waveform side of the parity contract (VERDICT r4 #5 / BASELINE.json:5
    # "waveforms within float tolerance" — previously measured nowhere
    # on-chip). Two decompositions on the probe batch:
    #   * wav_divergence_total: serving reconstruct vs the f32 archival
    #     lowering end-to-end — includes the effect of the ~8-9% index flips.
    #   * wav_divergence_decode_only: both decoders fed the SAME (serving)
    #     indices — isolates decode-side dtype/kernel divergence from the
    #     index flips. This is the number that must stay inside float
    #     tolerance for archival decode to be lowering-independent.
    from nsc_tpu.eval import quality

    f32_codec = NeuralSpeechCodec(f32_cfg)
    wav_serv = np.asarray(
        jax.jit(lambda p, q, w: model.reconstruct(p, q, w))(params, rvq, pw)
    )
    wav_f32 = np.asarray(
        jax.jit(lambda p, q, w: f32_codec.reconstruct(p, q, w))(params, rvq, pw)
    )
    dec_serv = np.asarray(
        jax.jit(lambda p, q, i: model.decode(p, q, i))(params, rvq, idx_serv)
    )
    dec_f32 = np.asarray(
        jax.jit(lambda p, q, i: f32_codec.decode(p, q, i))(params, rvq, idx_serv)
    )
    wav_div_total = {
        "mel_distance": round(
            quality.mel_distance(wav_f32, wav_serv, cfg.sample_rate), 6
        ),
        "max_abs": round(float(np.max(np.abs(wav_serv - wav_f32))), 6),
    }
    wav_div_decode = {
        "mel_distance": round(
            quality.mel_distance(dec_f32, dec_serv, cfg.sample_rate), 6
        ),
        "max_abs": round(float(np.max(np.abs(dec_serv - dec_f32))), 6),
    }

    # Argmin safety margins (VERDICT r4 #5b): distribution of top1-top2 f32
    # distance gaps on the probe — the predictive indicator for pin
    # stability. Trend across rounds lives in docs/PERFORMANCE.md.
    from nsc_tpu.ops import rvq as rvq_ops

    lat = jax.jit(lambda p, w: model.latents(p, w))(params, pw)
    margins = np.asarray(
        jax.jit(lambda q, z: rvq_ops.argmin_margins(q, z))(rvq, lat)
    ).ravel()
    margin_pct = {
        "p0": float(np.min(margins)),
        "p1": float(np.percentile(margins, 1)),
        "p5": float(np.percentile(margins, 5)),
        "p50": float(np.percentile(margins, 50)),
    }
    margin_pct = {k: round(v, 8) for k, v in margin_pct.items()}

    print(
        json.dumps(
            {
                "metric": "rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 250.0, 3),
                "rtf_per_dispatch": round(rtf_sync, 2),
                "checkpoint": ckpt,
                # three-state: true/false = measured against a comparable
                # pin; null = no comparable pin existed (status says why) —
                # "not measured" must not read as a parity regression
                "index_parity_exact": (
                    None if pin_exact is None else bool(pin_exact)
                ),
                "index_parity_status": pin_status,
                "index_match_vs_pinned_canonical": round(pin_rate, 6),
                "index_match_vs_reference_lowering": round(match_ref, 6),
                "index_match_vs_f32_parity": round(match_f32, 6),
                "wav_divergence_total": wav_div_total,
                "wav_divergence_decode_only": wav_div_decode,
                "argmin_margin_percentiles": margin_pct,
            }
        )
    )


if __name__ == "__main__":
    main()
