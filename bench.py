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


def _flagship():
    """The flagship serving bundle: the TRAINED base_fast checkpoint when the
    artifact exists (its trained activation IS the fast serving activation,
    so the headline path is the checkpoint's own parity lowering — VERDICT
    r2 item 1), random-init base_fast otherwise."""
    from nsc_tpu import api

    here = os.path.dirname(os.path.abspath(__file__))
    # newest by mtime, NOT lexicographic: "base_fast_9000" sorts after
    # "base_fast_30000" and would silently bench an older checkpoint
    # (ADVICE r3)
    ckpts = glob.glob(os.path.join(here, "artifacts", "base_fast_*"))
    ckpt = max(ckpts, key=os.path.getmtime) if ckpts else None
    bundle = api.load_model("base_fast", checkpoint=ckpt, serving=True)
    return bundle, (os.path.relpath(ckpt, here) if ckpt else None)


def main() -> None:
    from nsc_tpu import api
    from nsc_tpu.utils.cache import enable_compilation_cache

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

    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        checksum = float(fn(params, rvq, wav))
    wall = (time.perf_counter() - start) / iters
    assert np.isfinite(checksum)

    audio_seconds = batch * seconds
    rtf = audio_seconds / wall

    # Index parity of the measured path (VERDICT r2 item 1: the headline
    # number must carry its parity status in the JSON itself, not in prose).
    # (a) serving path vs its own reference lowering at the SAME serving
    #     dtype (reference convs + XLA RVQ scan, identical activation — the
    #     checkpoint is TRAINED with snake_fast, so no activation
    #     approximation is involved): measures whether the Pallas kernels
    #     change any archived index.
    # (b) serving path vs the f32 archival parity path (load_model default):
    #     the cross-dtype stability rate (bf16 rounding near argmin ties).
    from nsc_tpu.models.codec import NeuralSpeechCodec

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

    print(
        json.dumps(
            {
                "metric": "rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 250.0, 3),
                "checkpoint": ckpt,
                "index_parity_exact": bool(match_ref == 1.0),
                "index_match_vs_reference_lowering": round(match_ref, 6),
                "index_match_vs_f32_parity": round(match_f32, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
