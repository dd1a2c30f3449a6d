"""CLI: compress/decompress WAV files from the command line (SURVEY.md §3 #21).

  python -m nsc_tpu compress   in.wav out.nsc [--model base] [--n-q 8]
  python -m nsc_tpu decompress in.nsc out.wav [--model base] [--streaming 1.0]
  python -m nsc_tpu roundtrip  in.wav out.wav [--model base] [--n-q 8]
  python -m nsc_tpu eval       ref.wav [deg.wav] [--model base] [--n-q 8]
  python -m nsc_tpu info       in.nsc
  python -m nsc_tpu models
  python -m nsc_tpu doctor     [--timeout 60] [--json]

(`eval` with one file scores a codec round-trip of it; with two files it
scores deg against ref directly.  The bitrate-sweep harness is separate:
`python -m nsc_tpu.eval --model base --data <dir>` — SURVEY.md §3 #19.)
"""

from __future__ import annotations

import argparse
import sys

# Set by _doctor when a deadline-guarded probe left a thread parked inside
# the XLA runtime: interpreter teardown is then unsafe (can SIGABRT) and
# _entry hard-exits instead. In-process callers are unaffected.
_TEARDOWN_UNSAFE = False


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nsc_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_model_args(sp):
        sp.add_argument("--model", default="base", help="config name")
        sp.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument(
            "--serving", action="store_true",
            help="measured-fastest TPU path (bf16 + Pallas kernels + "
            "polynomial snake; ~1.5%% index deviation vs the exact path)",
        )
        sp.add_argument(
            "--int8", action="store_true",
            help="W8A8 int8 serving with statically calibrated activation "
            "scales (nsc_tpu.quantize_model)",
        )

    c = sub.add_parser("compress", help="wav -> nsc bitstream")
    c.add_argument("input"), c.add_argument("output")
    c.add_argument("--n-q", type=int, default=None, help="codebooks to use")
    c.add_argument(
        "--streaming", type=float, default=None, metavar="SECONDS",
        help="encode in chunks of this many seconds through the streaming "
        "encoder (identical indices to batch mode; bounded memory)",
    )
    c.add_argument(
        "--entropy", action="store_true",
        help="arithmetic-code the index planes (smaller streams for "
        "trained codebooks; decompress auto-detects)",
    )
    c.add_argument(
        "--queue-chunks", type=int, default=4, metavar="K",
        help="streaming mode: chunks encoded per device dispatch "
        "(throughput; 1 = strict chunk-at-a-time latency; identical bytes)",
    )
    add_model_args(c)

    d = sub.add_parser("decompress", help="nsc bitstream -> wav")
    d.add_argument("input"), d.add_argument("output")
    d.add_argument("--n-q", type=int, default=None)
    d.add_argument(
        "--streaming", type=float, default=None, metavar="SECONDS",
        help="decode in chunks of this many seconds through the streaming "
        "decoder (bounded memory for long streams)",
    )
    d.add_argument(
        "--queue-chunks", type=int, default=4, metavar="K",
        help="streaming mode: index blocks decoded per device dispatch "
        "(throughput; 1 = strict chunk-at-a-time latency; identical bytes)",
    )
    add_model_args(d)

    r = sub.add_parser("roundtrip", help="wav -> codes -> wav")
    r.add_argument("input"), r.add_argument("output")
    r.add_argument("--n-q", type=int, default=None)
    add_model_args(r)

    e = sub.add_parser(
        "eval", help="quality metrics: ref vs deg, or a codec round-trip"
    )
    e.add_argument("reference", help="clean/reference wav")
    e.add_argument(
        "degraded", nargs="?", default=None,
        help="degraded wav; omitted = round-trip `reference` through the model",
    )
    e.add_argument("--n-q", type=int, default=None)
    e.add_argument(
        "--ceiling", action="store_true",
        help="round-trip mode only: also decode the UN-quantized latents "
        "(the model's infinite-bitrate autoencoder bound) and report the "
        "quantization gap — how much of the distortion the quantizer is "
        "responsible for at this depth (docs/PERFORMANCE.md round 5)",
    )
    e.add_argument("--json", action="store_true", help="machine-readable output")
    add_model_args(e)

    i = sub.add_parser("info", help="print bitstream header")
    i.add_argument("input")

    sub.add_parser("models", help="list model configs")

    doc = sub.add_parser(
        "doctor",
        help="environment / device diagnostics (deadline-guarded: safe to "
        "run even when the accelerator link is wedged)",
    )
    doc.add_argument(
        "--timeout", type=float, default=None,
        help="device-probe deadline in seconds "
        "(default NSC_DEVICE_CHECK_TIMEOUT or 420)",
    )
    doc.add_argument("--json", action="store_true")
    return p


def _print_quality(ref, deg, sample_rate, as_json, extra=None) -> int:
    """Score deg against ref with the full SURVEY.md §3 #19 metric set."""
    import json

    from nsc_tpu.eval import quality

    m = dict(extra or {})
    m["si_snr_db"] = round(quality.si_snr(ref, deg), 3)
    m["snr_db"] = round(quality.snr(ref, deg), 3)
    m["mel_distance"] = round(quality.mel_distance(ref, deg, sample_rate), 4)
    m["fw_seg_snr_db"] = round(quality.fw_seg_snr(ref, deg, sample_rate), 3)
    m["pesq_proxy"] = round(quality.pesq_proxy(ref, deg, sample_rate), 3)
    m["stoi_proxy"] = round(quality.stoi_proxy(ref, deg, sample_rate), 4)
    m["visqol_nsim"] = round(quality.visqol_nsim(ref, deg, sample_rate), 4)
    try:  # faithful Taal et al. 2011 — needs >=30 active frames at 10 kHz
        m["stoi"] = round(quality.stoi(ref, deg, sample_rate), 4)
    except ValueError as e:
        m["stoi_error"] = str(e)
    if as_json:
        print(json.dumps(m))
    else:
        for k, v in m.items():
            print(f"{k:16s} {v}")
        print(
            "(pesq_proxy: fwSegSNR logistic, NOT ITU-T P.862; stoi: "
            "faithful Taal et al. 2011; stoi_proxy: envelope-correlation "
            "construction; visqol_nsim: gammatone-NSIM core of ViSQOL, "
            "NOT ViSQOL v3 — see nsc_tpu/eval/quality.py)"
        )
    return 0


def _doctor(args) -> int:
    """Environment diagnostics (SURVEY.md §6 failure-detection row): report
    versions, backend, and a DEADLINE-GUARDED device probe, so the command
    answers in bounded time even when the accelerator link is wedged (the
    failure mode where plain `jax.devices()` hangs forever —
    docs/RUNBOOK.md "Relay wedge"). Exit 0 = device answered; 97 = wedged
    (nsc_tpu.utils.liveness.EXIT_DEVICE_WEDGED); 2 = backend init failed."""
    import json
    import os

    import nsc_tpu
    from nsc_tpu.utils import liveness

    out: dict = {"nsc_tpu": getattr(nsc_tpu, "__version__", "unknown")}
    import jax

    out["jax"] = jax.__version__
    import numpy as np

    out["numpy"] = np.__version__
    out["jax_platforms_env"] = os.environ.get("JAX_PLATFORMS")
    out["compilation_cache_dir"] = os.environ.get("NSC_TPU_CACHE_DIR") or (
        os.path.expanduser("~/.cache/nsc_tpu_xla")
    )
    out["compilation_cache_present"] = os.path.isdir(
        out["compilation_cache_dir"]
    )

    timeout = args.timeout if args.timeout is not None else float(
        os.environ.get("NSC_DEVICE_CHECK_TIMEOUT", "420")
    )

    # Two deadline-guarded backend touches (liveness.run_with_deadline — the
    # shared mechanism; a wedged claim parks a daemon thread, not the CLI):
    # 1. jax.devices() — the first, hangable backend init;
    # 2. a tiny program + host readback — dispatch alone succeeds even when
    #    d2h is dead, so the readback is the definitive liveness signal.
    # NOTE for callers wrapping this command in an outer `timeout`: the
    # worst case is ~2x the per-stage deadline (both stages wedging slowly).
    def _touch():
        devs = jax.devices()
        return {
            "backend": jax.default_backend(),
            "device_count": len(devs),
            "devices": [str(d) for d in devs],
        }

    rc = 0
    status, value, _ = liveness.run_with_deadline(_touch, timeout)
    if status == "error":
        out["device_status"] = "error"
        out["device_error"] = str(value)
        rc = 2
    elif status == "timeout":
        out["device_status"] = "wedged"
        out["device_detail"] = (
            f"jax.devices() gave no answer in {timeout:.0f}s — the "
            "device/relay claim is hung (docs/RUNBOOK.md 'Relay wedge'); "
            "restarting this process will not fix it"
        )
        rc = liveness.EXIT_DEVICE_WEDGED
    else:
        out.update(value)
        status, value, _ = liveness.run_with_deadline(
            liveness._default_probe, timeout
        )
        if status == "timeout":
            out["device_status"] = "wedged"
            out["device_detail"] = "device program gave no result in deadline"
            rc = liveness.EXIT_DEVICE_WEDGED
        elif status == "error":
            out["device_status"] = "error"
            out["device_error"] = str(value)
            rc = 2
        else:
            out["device_status"] = "ok"

    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:26s} {v}")
    if out.get("device_status") == "wedged":
        # a timed-out probe leaves a daemon thread PARKED inside the XLA
        # runtime; normal interpreter teardown then races it and can SIGABRT
        # (observed exit 134, 2026-08-19 04:28 — docs/RUNBOOK.md). Flag the
        # CLI entry point to skip teardown (_entry does the os._exit) so
        # supervisors always see the documented exit code; in-process
        # callers (tests) still get a plain return value.
        global _TEARDOWN_UNSAFE
        _TEARDOWN_UNSAFE = True
    return rc


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "doctor":
        return _doctor(args)

    if args.cmd == "models":
        from nsc_tpu.configs import get_config, list_configs

        for name in list_configs():
            cfg = get_config(name)
            print(
                f"{name:12s} hop={cfg.hop:4d} frame_rate={cfg.frame_rate:6.1f}Hz "
                f"n_q={cfg.num_quantizers:2d} K={cfg.codebook_size:4d} "
                f"max_bitrate={cfg.bitrate()/1000:.2f}kbps"
            )
        return 0

    if args.cmd == "info":
        from nsc_tpu.bitstream import BitstreamHeader

        blob = open(args.input, "rb").read()
        h, off = BitstreamHeader.from_bytes(blob)
        dur = h.orig_len / h.sample_rate
        bitrate = (len(blob) - off) * 8 / dur if dur else 0.0
        from nsc_tpu.bitstream import FLAG_FINGERPRINT

        fp = (
            f" codebook_fp={h.fingerprint:#010x}"
            if h.flags & FLAG_FINGERPRINT else ""
        )
        print(
            f"model={h.model_name} sr={h.sample_rate} hop={h.hop} "
            f"n_q={h.n_q} bits={h.bits} frames={h.num_frames} "
            f"duration={dur:.2f}s payload_bitrate={bitrate/1000:.2f}kbps{fp}"
        )
        return 0

    if args.cmd == "eval" and args.degraded is not None:
        # two-file scoring needs no model at all
        from nsc_tpu.utils import audio

        ref, sr = audio.load_wav(args.reference)
        deg, dsr = audio.load_wav(args.degraded, target_sr=sr)
        ref, deg = audio.to_mono(ref), audio.to_mono(deg)
        n = min(len(ref), len(deg))
        return _print_quality(ref[:n], deg[:n], sr, args.json)

    import nsc_tpu
    from nsc_tpu.utils import audio

    bundle = nsc_tpu.load_model(
        args.model, checkpoint=args.checkpoint, seed=args.seed,
        serving=getattr(args, "serving", False),
    )
    if getattr(args, "int8", False):
        bundle = nsc_tpu.quantize_model(bundle)

    if args.cmd == "compress":
        wav, _ = audio.load_wav(args.input, target_sr=bundle.cfg.sample_rate)
        wav = audio.to_mono(wav)
        if args.streaming:
            blob = nsc_tpu.streaming_compress(
                bundle, wav, chunk_seconds=args.streaming, n_q=args.n_q,
                entropy_coding=args.entropy, queue_chunks=args.queue_chunks,
            )
        else:
            blob = nsc_tpu.compress(
                bundle, wav, n_q=args.n_q, entropy_coding=args.entropy
            )
        open(args.output, "wb").write(blob)
        ratio = wav.nbytes / len(blob)
        print(f"wrote {args.output}: {len(blob)} bytes ({ratio:.1f}x vs f32 PCM)")
        return 0

    if args.cmd == "decompress":
        blob = open(args.input, "rb").read()
        if args.streaming:
            wav = nsc_tpu.streaming_decompress(
                bundle, blob, chunk_seconds=args.streaming, n_q=args.n_q,
                queue_chunks=args.queue_chunks,
            )
        else:
            wav = nsc_tpu.decompress(bundle, blob, n_q=args.n_q)
        audio.save_wav(args.output, wav, bundle.cfg.sample_rate)
        print(f"wrote {args.output}: {len(wav)} samples")
        return 0

    if args.cmd == "eval":
        wav, _ = audio.load_wav(args.reference, target_sr=bundle.cfg.sample_rate)
        wav = audio.to_mono(wav)
        blob = nsc_tpu.compress(bundle, wav, n_q=args.n_q)
        out = nsc_tpu.decompress(bundle, blob)[: len(wav)]
        dur = len(wav) / bundle.cfg.sample_rate
        extra = {"bitrate_kbps": round(len(blob) * 8 / dur / 1000, 3)} if dur else {}
        if getattr(args, "ceiling", False):
            # infinite-bitrate bound: decode the un-quantized latents
            # (models/codec.py::decode_latents) — positions this depth's
            # mel on the measured [ceiling .. distortion] axis
            import numpy as np

            from nsc_tpu.eval import quality

            pad = (-len(wav)) % bundle.cfg.hop
            w = np.pad(wav, (0, pad))[None, :]
            z = bundle.model.latents(bundle.params, w)
            rec = np.asarray(
                bundle.model.decode_latents(bundle.params, z)
            )[0, : len(wav)]
            ceil_mel = round(
                quality.mel_distance(wav, rec, bundle.cfg.sample_rate), 4
            )
            extra["ceiling_mel_distance"] = ceil_mel
            extra["ceiling_si_snr_db"] = round(quality.si_snr(wav, rec), 3)
            extra["quant_gap_mel"] = round(
                quality.mel_distance(wav, out, bundle.cfg.sample_rate)
                - ceil_mel, 4
            )
        return _print_quality(
            wav, out, bundle.cfg.sample_rate, args.json, extra=extra
        )

    if args.cmd == "roundtrip":
        wav, _ = audio.load_wav(args.input, target_sr=bundle.cfg.sample_rate)
        wav = audio.to_mono(wav)
        blob = nsc_tpu.compress(bundle, wav, n_q=args.n_q)
        out = nsc_tpu.decompress(bundle, blob)
        audio.save_wav(args.output, out, bundle.cfg.sample_rate)
        print(f"wrote {args.output} ({len(blob)} byte stream)")
        return 0

    return 1


def _entry() -> int:
    try:
        rc = main()
        if _TEARDOWN_UNSAFE:
            sys.stdout.flush()
            sys.stderr.flush()
            import os

            os._exit(rc)
        return rc
    except FileNotFoundError as e:
        print(f"error: file not found: {e.filename or e}", file=sys.stderr)
    except (ValueError, KeyError) as e:
        from nsc_tpu.bitstream import BitstreamError

        kind = "bitstream error" if isinstance(e, BitstreamError) else "error"
        print(f"{kind}: {e}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(_entry())
