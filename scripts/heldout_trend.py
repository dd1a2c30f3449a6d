"""Held-out quality trend across a run's harvested checkpoints (r5).

Evaluates EVERY checkpoint under `<run>/harvest/` (see
scripts/harvest_checkpoints.sh) on a fixed held-out batch and appends one
JSONL row per step, so the held-out optimum of a live or finished run is a
measured curve instead of a guess. Two protocols per row:

  * `mel_short` / `si_snr_short` — TRAINING-LENGTH segments (default 17600
    samples, hop-aligned), fresh draws from the pool-stripped data spec at a
    disjoint seed. This is the apples-to-apples generalization number: the
    r5 diagnosis showed synthetic2's per-segment structure (whole-segment
    pitch glides, segment-relative syllable gating — train/data.py
    SyntheticSourceV2._segment) makes 10 s draws DISTRIBUTIONALLY DIFFERENT
    from 1.1 s training segments (step-14k checkpoint: mel 0.58 on 1.1 s
    held-out vs 1.01 on 10 s held-out, while pool mel was 0.58 — i.e. the
    10 s number measures duration-shift, not memorization).
  * `mel_10s` / `si_snr_10s` — the historical 4x10 s protocol
    (refit/finetune reports), kept as the duration-generalization
    diagnostic and for cross-round comparability.

Incremental: steps already present in --out are skipped, so re-running as
the harvester copies new checkpoints only evaluates the new ones.

Usage:
    python scripts/heldout_trend.py runs/base_fast_synthetic2_50k \
        [--config base_fast] [--data synthetic2] [--cpu] \
        [--out <run>/heldout_trend.jsonl]
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
    p.add_argument("run_dir")
    p.add_argument("--config", default="base_fast")
    p.add_argument("--data", default="synthetic2",
                   help="eval distribution (':pool=N' suffix stripped)")
    p.add_argument("--eval-seed", type=int, default=1)
    p.add_argument("--segment-len", type=int, default=17600,
                   help="training segment length in samples (short protocol)")
    p.add_argument("--batch-short", type=int, default=16)
    p.add_argument("--batch-10s", type=int, default=4)
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None,
                   help="default: <run_dir>/heldout_trend.jsonl")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nsc_tpu import api
    from nsc_tpu.eval.sweep import bitrate_sweep
    from nsc_tpu.train.data import make_source
    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    run = os.path.abspath(args.run_dir)
    out = args.out or os.path.join(run, "heldout_trend.jsonl")
    done = set()
    if os.path.exists(out):
        with open(out) as f:
            done = {json.loads(l)["step"] for l in f if l.strip()}

    cfg = api.get_config(args.config)
    spec = args.data.partition(":pool=")[0]
    seg = args.segment_len // cfg.hop * cfg.hop
    held = next(make_source(spec, cfg.sample_rate, seed=args.eval_seed)
                .batches(args.batch_short, seg))
    seg10 = int(10.0 * cfg.sample_rate) // cfg.hop * cfg.hop
    held10 = next(make_source(spec, cfg.sample_rate, seed=args.eval_seed)
                  .batches(args.batch_10s, seg10))

    harvest = os.path.join(run, "harvest")
    if not os.path.isdir(harvest):
        print(f"no harvest/ under {run} — run scripts/harvest_checkpoints.sh",
              file=sys.stderr)
        return 1
    steps = sorted(int(s) for s in os.listdir(harvest) if s.isdigit())
    new = [s for s in steps if s not in done]
    if not new:
        print(f"no new steps (have {len(done)}, harvest has {len(steps)})")
        return 0

    for st in new:
        # orbax restores the LATEST step in a directory: give each candidate
        # its own single-step view via symlink
        iso = os.path.join(harvest, f".iso_{st}")
        os.makedirs(iso, exist_ok=True)
        link = os.path.join(iso, str(st))
        if not os.path.exists(link):
            os.symlink(os.path.join(harvest, str(st)), link)
        b = api.load_model(args.config, checkpoint=iso, serving=True)
        r = bitrate_sweep(b, held, [args.depth])[0]
        r10 = bitrate_sweep(b, held10, [args.depth])[0]
        row = {
            "step": st,
            "mel_short": round(float(r["mel_distance"]), 4),
            "si_snr_short": round(float(r["si_snr_db"]), 2),
            "usage": round(float(np.mean(r["book_usage"])), 4),
            "mel_10s": round(float(r10["mel_distance"]), 4),
            "si_snr_10s": round(float(r10["si_snr_db"]), 2),
        }
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rows = [json.loads(l) for l in open(out) if l.strip()]
    rows.sort(key=lambda r: r["step"])
    best = min(rows, key=lambda r: r["mel_short"])
    print(f"held-out best (mel_short): step {best['step']} "
          f"mel {best['mel_short']} si_snr {best['si_snr_short']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
