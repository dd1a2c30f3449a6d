"""CLI: compress/decompress WAV files from the command line (SURVEY.md §3 #21).

  python -m nsc_tpu compress   in.wav out.nsc [--model base] [--n-q 8]
  python -m nsc_tpu decompress in.nsc out.wav [--model base]
  python -m nsc_tpu roundtrip  in.wav out.wav [--model base] [--n-q 8]
  python -m nsc_tpu info       in.nsc
  python -m nsc_tpu models
"""

from __future__ import annotations

import argparse
import sys


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
    add_model_args(c)

    d = sub.add_parser("decompress", help="nsc bitstream -> wav")
    d.add_argument("input"), d.add_argument("output")
    d.add_argument("--n-q", type=int, default=None)
    add_model_args(d)

    r = sub.add_parser("roundtrip", help="wav -> codes -> wav")
    r.add_argument("input"), r.add_argument("output")
    r.add_argument("--n-q", type=int, default=None)
    add_model_args(r)

    i = sub.add_parser("info", help="print bitstream header")
    i.add_argument("input")

    sub.add_parser("models", help="list model configs")
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)

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
            import numpy as np

            from nsc_tpu import bitstream
            from nsc_tpu.streaming import StreamingEncoder

            cfg = bundle.cfg
            hop = cfg.hop
            chunk = max(hop, int(args.streaming * cfg.sample_rate) // hop * hop)
            pad = (-len(wav)) % hop
            padded = np.pad(wav, (0, pad))
            enc = StreamingEncoder(
                bundle.model, bundle.params, bundle.rvq, n_q=args.n_q
            )
            parts = [
                enc.push(padded[i : i + chunk])
                for i in range(0, len(padded), chunk)
            ]
            idx = np.concatenate(parts, axis=0)
            from nsc_tpu.api import codebook_fingerprint

            flags = bitstream.FLAG_FINGERPRINT
            if args.entropy:
                flags |= bitstream.FLAG_ENTROPY
            header = bitstream.BitstreamHeader(
                model_name=cfg.name, bits=cfg.bits_per_codebook,
                n_q=idx.shape[-1], sample_rate=cfg.sample_rate, hop=hop,
                num_frames=idx.shape[0], orig_len=len(wav),
                flags=flags,
                fingerprint=codebook_fingerprint(bundle.rvq),
            )
            blob = bitstream.serialize(header, idx)
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
        wav = nsc_tpu.decompress(bundle, blob, n_q=args.n_q)
        audio.save_wav(args.output, wav, bundle.cfg.sample_rate)
        print(f"wrote {args.output}: {len(wav)} samples")
        return 0

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
        return main()
    except FileNotFoundError as e:
        print(f"error: file not found: {e.filename or e}", file=sys.stderr)
    except (ValueError, KeyError) as e:
        from nsc_tpu.bitstream import BitstreamError

        kind = "bitstream error" if isinstance(e, BitstreamError) else "error"
        print(f"{kind}: {e}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(_entry())
