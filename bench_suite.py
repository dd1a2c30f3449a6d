"""Extended benchmark suite: one measurement per BASELINE.json config.

  python bench_suite.py [--out bench_suite.json] [--configs 1,2,3,4,5]

1. Single 10 s 16 kHz WAV encode->RVQ->decode on CPU, smallest config.
2. Batched inference: 64 x 10 s, full RVQ depth + streaming chunked encode.
3. Training step (codec-only) on a speech-like batch.
4. Full GAN training step, data-parallel over the attached mesh.
5. Bitrate sweep with quality scoring (PESQ proxy) per depth.

Each entry reports wall-clock with compile excluded and a relay-safe
completion barrier (see CLAUDE.md). bench.py remains the driver's one-line
RTF metric; this suite is the wider evidence set.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def _read_back(out):
    import jax.numpy as jnp

    jax.tree.map(
        lambda x: float(jnp.sum(jnp.abs(jnp.ravel(x)[:1].astype(jnp.float32)))),
        out,
    )


def _barrier_time(fn, *args, iters=3):
    _read_back(fn(*args))
    ts = []
    for _i in range(iters):
        s = time.perf_counter()
        _read_back(fn(*args))
        ts.append(time.perf_counter() - s)
    return min(ts)


import jax  # noqa: E402  (after helper def for readability)
import jax.numpy as jnp  # noqa: E402


def config1_cpu_single():
    """10 s WAV on CPU, smallest config."""
    import nsc_tpu

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bundle = nsc_tpu.load_model("small")
        wav = (np.random.RandomState(0).randn(160000) * 0.1).astype(np.float32)
        blob = nsc_tpu.compress(bundle, wav)
        s = time.perf_counter()
        out = nsc_tpu.decompress(bundle, blob)
        dt_dec = time.perf_counter() - s
        s = time.perf_counter()
        blob = nsc_tpu.compress(bundle, wav)
        dt_enc = time.perf_counter() - s
    return {
        "config": 1,
        "desc": "10s WAV encode+decode, CPU, smallest config",
        "encode_s": round(dt_enc, 3),
        "decode_s": round(dt_dec, 3),
        "rtf_cpu": round(10.0 / (dt_enc + dt_dec), 2),
        "stream_bytes": len(blob),
    }


def config2_batched_and_streaming():
    from nsc_tpu.configs import get_config
    from nsc_tpu.models.codec import init_codec, NeuralSpeechCodec
    from nsc_tpu import streaming

    cfg = dataclasses.replace(
        get_config("base"), compute_dtype="bfloat16", rvq_backend="pallas"
    )
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(64, 160000).astype(np.float32) * 0.1
    )
    fn = jax.jit(lambda p, q, w: jnp.sum(model.reconstruct(p, q, w)))
    dt = _barrier_time(lambda w: fn(params, rvq, w), wav)
    batched_rtf = 64 * 10.0 / dt

    # streaming chunked encode: 64-way stream, 0.5 s chunks
    enc = streaming.StreamingEncoder(model, params, rvq)
    chunk = np.asarray(wav[:, :8000])
    enc.push(chunk)  # compile
    s = time.perf_counter()
    n_chunks = 8
    for i in range(n_chunks):
        enc.push(chunk)
    dt_c = (time.perf_counter() - s) / n_chunks
    return {
        "config": 2,
        "desc": "64x10s batched encode+decode + streaming chunked encode",
        "batched_ms": round(dt * 1000, 1),
        "batched_rtf_per_chip": round(batched_rtf, 1),
        "stream_chunk_ms": round(dt_c * 1000, 1),
        "stream_rtf": round(64 * 0.5 / dt_c, 1),
    }


def config34_train_steps(use_gan: bool):
    from nsc_tpu.configs import TrainConfig, get_config
    from nsc_tpu.parallel import make_mesh, make_parallel_train_step, replicate, shard_batch
    from nsc_tpu.train.train import init_train_state
    from nsc_tpu.train.data import SyntheticSource

    cfg = get_config("small")
    tcfg = TrainConfig(
        batch_size=16, segment_seconds=1.0, use_gan=use_gan,
        disc_width_mult=0.25, quantizer_dropout=0.5,
        stft_fft_sizes=(1024, 512, 256), mel_fft_size=1024, mel_bins=80,
    )
    mesh = make_mesh()
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    state = replicate(mesh, state)
    step = make_parallel_train_step(model, tcfg, mesh)
    seg = int(tcfg.segment_seconds * cfg.sample_rate) // cfg.hop * cfg.hop
    batch = shard_batch(
        mesh, next(SyntheticSource(cfg.sample_rate, 0).batches(tcfg.batch_size, seg))
    )
    state, metrics = step(state, batch)  # compile
    _ = float(metrics["loss/g_total"])
    ts = []
    for _i in range(3):
        s = time.perf_counter()
        state, metrics = step(state, batch)
        _ = float(metrics["loss/g_total"])
        ts.append(time.perf_counter() - s)
    dt = min(ts)
    return {
        "config": 4 if use_gan else 3,
        "desc": ("full GAN" if use_gan else "codec-only")
        + " train step, small config, batch 16x1s, DP mesh",
        "step_ms": round(dt * 1000, 1),
        "audio_sec_per_sec": round(16.0 / dt, 1),
        "g_loss": round(float(metrics["loss/g_total"]), 4),
        "devices": int(mesh.devices.size),
    }


def config5_sweep():
    import nsc_tpu
    from nsc_tpu.eval.sweep import bitrate_sweep

    bundle = nsc_tpu.load_model("base")
    wavs = (np.random.RandomState(0).randn(2, 160000) * 0.1).astype(np.float32)
    rows = bitrate_sweep(bundle, wavs, n_q_list=[1, 2, 4, 8, 16])
    return {
        "config": 5,
        "desc": "bitrate sweep, base config (random-init weights)",
        "rows": rows,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="bench_suite.json")
    p.add_argument("--configs", default="1,2,3,4,5")
    args = p.parse_args()

    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    wanted = {int(x) for x in args.configs.split(",")}
    results = []
    runners = {
        1: config1_cpu_single,
        2: config2_batched_and_streaming,
        3: lambda: config34_train_steps(False),
        4: lambda: config34_train_steps(True),
        5: config5_sweep,
    }
    # merge with an existing results file so partial reruns don't clobber
    try:
        results = [
            r for r in json.load(open(args.out)) if r.get("config") not in wanted
        ]
    except (OSError, ValueError):
        results = []
    for i in sorted(wanted):
        print(f"--- config {i} ---", flush=True)
        try:
            row = runners[i]()
        except Exception as e:  # record, keep going
            row = {"config": i, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        results.append(row)
    results.sort(key=lambda r: r.get("config", 0))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
