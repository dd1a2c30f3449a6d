"""Pick which checkpoint of a finished run to export (r5 close helper).

    python scripts/pick_export_step.py runs/base_fast_synthetic2_50k \
        [--config base_fast] [--data synthetic2] [--batch 4] [--seconds 10]

The train loop exports two inference checkpoints: `infer/` (latest step) and
`infer_best/` (best WINDOWED TRAIN mel — train/loop.py). For a GAN run the
windowed train metric can prefer a mid-run step whose adversarial quality is
worse, and the finetune overfit episode (docs/finetune_report.json) showed
train-metric selection can disagree with held-out quality outright. This
helper settles it with data: a held-out full-depth bitrate_sweep of BOTH
checkpoints on a fresh-draw eval batch (seed 1, the refit/finetune report
protocol), printed side by side, and a recommendation by held-out mel.

Exit code: 0; prints `RECOMMEND --step <n>` on the last line for scripting
(`scripts/export_flagship.py ... --step $(... | tail -1 | awk '{print $2}')`).
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
                   help="held-out eval distribution (pool suffix stripped)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--eval-seed", type=int, default=1)
    p.add_argument("--depths", default="8,16")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nsc_tpu import api
    from nsc_tpu.eval.sweep import bitrate_sweep
    from nsc_tpu.train import checkpoint as ckpt
    from nsc_tpu.train.data import make_source
    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    run_dir = os.path.abspath(args.run_dir)
    data_spec = args.data.partition(":pool=")[0]
    depths = [int(d) for d in args.depths.split(",")]

    cands = []
    for sub in ("infer", "infer_best"):
        d = os.path.join(run_dir, sub)
        step = ckpt.latest_step(d)
        if step is not None:
            cands.append((sub, step, d))
    if not cands:
        print(f"no inference checkpoints under {run_dir}", file=sys.stderr)
        return 1
    # same step in both = identical export; drop the duplicate
    seen = set()
    cands = [c for c in cands if not (c[1] in seen or seen.add(c[1]))]

    wavs = None
    rows_by = {}
    for sub, step, d in cands:
        bundle = api.load_model(args.config, checkpoint=d, serving=True)
        if wavs is None:
            cfg = bundle.cfg
            seg = int(args.seconds * cfg.sample_rate) // cfg.hop * cfg.hop
            wavs = np.asarray(next(
                make_source(data_spec, cfg.sample_rate, seed=args.eval_seed)
                .batches(args.batch, seg)
            ))
        rows_by[(sub, step)] = bitrate_sweep(bundle, wavs, depths)

    print(f"{'checkpoint':>16} {'n_q':>4} {'mel':>8} {'si_snr':>8} "
          f"{'stoi':>6} {'usage':>6}")
    for (sub, step), rows in rows_by.items():
        for r in rows:
            usage = float(np.mean(r["book_usage"]))
            print(f"{sub + '@' + str(step):>16} {r['n_q']:>4} "
                  f"{r['mel_distance']:>8.4f} {r['si_snr_db']:>8.2f} "
                  f"{r.get('stoi', float('nan')):>6.3f} {usage:>6.3f}")

    best = min(
        rows_by.items(), key=lambda kv: kv[1][-1]["mel_distance"]
    )
    (sub, step), rows = best
    print(f"held-out full-depth mel favors {sub}@{step} "
          f"(mel {rows[-1]['mel_distance']:.4f})")
    print(f"RECOMMEND --step {step}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
