"""Rate-distortion ceiling analysis (VERDICT r4 next #3).

The 16-depth flagship sweep saturates from depth ~5 (mel ~0.26-0.27,
si_snr ~7 dB). This script makes "saturated" a MEASURED property instead of
an unexamined artifact, by bounding what any RVQ depth could achieve:

  * autoencoder ceiling — decode the UN-quantized latents
    (`codec.decode_latents(latents(wav))`): the infinite-bitrate bound of
    this encoder/decoder pair on this data. The sweep can approach but never
    beat it; if full-depth mel is already near the ceiling, adding depth
    buys nothing BY CONSTRUCTION and the bandwidth axis is honestly bounded
    by model capacity, not by quantizer quality.
  * quantization gap per depth — sweep mel minus ceiling mel: the part of
    the distortion the quantizer is responsible for at each rate.
  * no-information anchor — mel distance between two DIFFERENT utterances
    of the eval distribution: the scale's top end (what "codec conveys
    nothing" looks like), so ceiling/sweep numbers read as positions on a
    measured [ceiling .. anchor] axis rather than bare magnitudes.

Usage:  python scripts/rd_ceiling.py [artifact_dir] [--cpu] [--batch 4]
Writes docs/rd_ceiling.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("artifact", nargs="?", default=None,
                   help="default: newest flagship (bench.flagship_key)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (slow; for a wedged chip)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--eval-seed", type=int, default=1,
                   help="held-out seed (train used 0; matches refit/finetune "
                   "reports)")
    p.add_argument("--depths", default="1,2,4,8,12,16")
    p.add_argument("--out", default=os.path.join(REPO, "docs",
                                                 "rd_ceiling.json"))
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import glob

    import numpy as np

    from bench import flagship_key
    from nsc_tpu import api
    from nsc_tpu.eval import quality
    from nsc_tpu.eval.sweep import bitrate_sweep
    from nsc_tpu.train.data import make_source

    art = args.artifact
    if art is None:
        cands = glob.glob(os.path.join(REPO, "artifacts", "base_fast_*"))
        if not cands:
            print("no flagship artifact found", file=sys.stderr)
            return 1
        art = max(cands, key=flagship_key)
    art = os.path.abspath(art)
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    cfg_name, data_spec = meta["config"], meta.get("data") or "synthetic"

    bundle = api.load_model(cfg_name, checkpoint=art)
    cfg = bundle.cfg
    seg = int(args.seconds * cfg.sample_rate) // cfg.hop * cfg.hop
    wavs = np.asarray(next(
        make_source(data_spec, cfg.sample_rate, seed=args.eval_seed)
        .batches(args.batch, seg)
    ))

    # -- autoencoder ceiling (infinite bitrate) -----------------------------
    import jax.numpy as jnp

    lat_fn = jax.jit(lambda p, w: bundle.model.latents(p, w))
    dec_fn = jax.jit(lambda p, z: bundle.model.decode_latents(p, z))
    z = lat_fn(bundle.params, jnp.asarray(wavs))
    recon_ceiling = np.asarray(dec_fn(bundle.params, z))[..., : wavs.shape[-1]]

    def metrics(ref, deg):
        row = {
            "mel_distance": round(
                quality.mel_distance(ref, deg, cfg.sample_rate), 6
            ),
            "si_snr_db": round(quality.si_snr(ref, deg), 3),
        }
        try:
            row["stoi"] = round(quality.stoi(ref, deg, cfg.sample_rate), 4)
        except ValueError:
            pass
        return row

    ceiling = metrics(wavs, recon_ceiling)

    # -- no-information anchor (different utterances, same distribution) ----
    other = np.asarray(next(
        make_source(data_spec, cfg.sample_rate, seed=args.eval_seed + 1000)
        .batches(args.batch, seg)
    ))
    anchor = metrics(wavs, other)

    # -- sweep + per-depth quantization gap ----------------------------------
    depths = [int(d) for d in args.depths.split(",")]
    rows = bitrate_sweep(bundle, wavs, depths)
    for r in rows:
        r["mel_gap_vs_ceiling"] = round(
            r["mel_distance"] - ceiling["mel_distance"], 6
        )

    report = {
        "artifact": os.path.relpath(art, REPO),
        "data": data_spec,
        "eval_seed": args.eval_seed,
        "eval_frames": int(wavs.shape[0] * (wavs.shape[1] // cfg.hop)),
        "autoencoder_ceiling": ceiling,
        "no_information_anchor": anchor,
        "sweep": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

    print(f"artifact: {report['artifact']}  data: {data_spec}  "
          f"seed: {args.eval_seed}")
    print(f"{'point':>18} {'mel':>8} {'si_snr':>8} {'stoi':>6}")
    print(f"{'ceiling (inf bps)':>18} {ceiling['mel_distance']:>8.4f} "
          f"{ceiling['si_snr_db']:>8.2f} {ceiling.get('stoi', float('nan')):>6.3f}")
    for r in rows:
        print(f"{'n_q=' + str(r['n_q']):>18} {r['mel_distance']:>8.4f} "
              f"{r['si_snr_db']:>8.2f} {r.get('stoi', float('nan')):>6.3f}"
              f"   gap {r['mel_gap_vs_ceiling']:+.4f}")
    print(f"{'no-info anchor':>18} {anchor['mel_distance']:>8.4f} "
          f"{anchor['si_snr_db']:>8.2f} {anchor.get('stoi', float('nan')):>6.3f}")
    print(f"report -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
