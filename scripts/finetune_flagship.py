"""Decoder finetune of a trained serving artifact (VERDICT r4 #1).

    python scripts/finetune_flagship.py [artifacts/base_fast_synthetic_40k_refit]
        [--steps 20000] [--lr 1e-4] [--export base_fast_synthetic_40k_ft]

Freezes the artifact's encoder and codebooks, finetunes ONLY the decoder on
reconstruction losses across RVQ depths (nsc_tpu/train/finetune.py), then
measures before/after with the same held-out protocol as
scripts/refit_flagship.py (seed-1 batch, bitrate_sweep) so the resulting
report rows are directly comparable to docs/refit_report.json.

With --export NAME the finetuned state is written as artifacts/NAME/<step>
(meta.json records the finetune + a lineage depth, ADVICE r4 #3), and the
serving path's canonical indices are re-pinned beside it. NOTE: the encoder
and codebooks are bit-frozen, so the PIN INDICES ARE UNCHANGED by
construction — the new pin is written from the new bundle and self-checked
anyway. Export is REFUSED if the finetune worsened full-depth mel distance.

Run ON THE TPU HOST with the chip idle.
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
    p.add_argument(
        "artifact", nargs="?",
        default=os.path.join(REPO, "artifacts", "base_fast_synthetic_40k_refit"),
    )
    p.add_argument("--steps", type=int, default=20_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--workdir", default=None,
                   help="finetune run dir (default runs/finetune_<artifact>)")
    p.add_argument("--eval-seed", type=int, default=1,
                   help="held-out eval batch seed (train used 0; matches "
                   "refit_flagship.py)")
    p.add_argument("--depths", default="1,2,4,8,12,16")
    p.add_argument("--eval-every", type=int, default=1000,
                   help="held-out keep-best eval cadence (train/finetune.py)")
    p.add_argument("--no-keep-best", action="store_true",
                   help="export the final step even if a mid-run decoder "
                   "scored better held-out")
    p.add_argument("--export", default=None, help="artifacts/<name> to write")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--data", default=None,
        help="override the artifact's training data spec (e.g. "
        "'synthetic:pool=2048' to keep a 1-core host from throttling the "
        "chip; the pool is the same distribution, sampled with crop/gain "
        "augmentation)",
    )
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import numpy as np

    from nsc_tpu import api, canonical
    from nsc_tpu.eval.sweep import bitrate_sweep
    from nsc_tpu.train import checkpoint as ckpt
    from nsc_tpu.train import finetune
    from nsc_tpu.train.data import make_source

    art = os.path.abspath(args.artifact)
    name = os.path.basename(art)
    workdir = args.workdir or os.path.join(REPO, "runs", f"finetune_{name}")
    tcfg = finetune.finetune_config(
        args.steps, lr=args.lr, batch_size=args.batch_size
    )

    last_metrics, meta = finetune.run_finetune(
        art, workdir=workdir, steps=args.steps, tcfg=tcfg,
        data_spec=args.data, resume=not args.no_resume,
        eval_every=args.eval_every, keep_best=not args.no_keep_best,
    )
    print(f"finetune done: {last_metrics}")
    cfg_name, data_spec, step = meta["config"], meta["data"], int(meta["step"])

    # -- held-out end-to-end A/B (same protocol as refit_flagship.py) -------
    bundle_a = api.load_model(cfg_name, checkpoint=art, serving=True)
    cfg = bundle_a.cfg
    # restore_inference prefers workdir/infer_best (the keep-best export,
    # written when the final decoder is NOT the best held-out one) over
    # workdir/infer (the last step).
    used_best = ckpt.latest_step(os.path.join(workdir, "infer_best"))
    params_ft, rvq_ft = ckpt.restore_inference(
        workdir, bundle_a.params, bundle_a.rvq
    )
    bundle_b = dataclasses.replace(bundle_a, params=params_ft, rvq=rvq_ft)

    seg = int(10.0 * cfg.sample_rate) // cfg.hop * cfg.hop
    wavs = next(
        make_source(data_spec, cfg.sample_rate, seed=args.eval_seed)
        .batches(4, seg)
    )
    depths = [int(d) for d in args.depths.split(",")]
    rows_a = bitrate_sweep(bundle_a, wavs, depths)
    rows_b = bitrate_sweep(bundle_b, wavs, depths)

    report = {
        "artifact": os.path.relpath(art, REPO),
        "steps": args.steps,
        "lr": args.lr,
        "last_metrics": last_metrics,
        "selected": (f"infer_best@{used_best}" if used_best is not None
                     else f"infer@{args.steps}"),
        "sweep_before": rows_a,
        "sweep_after": rows_b,
    }
    print(f"{'n_q':>4} {'mel before':>11} {'mel after':>10} "
          f"{'si_snr b':>9} {'si_snr a':>9} {'stoi b':>7} {'stoi a':>7}")
    for ra, rb in zip(rows_a, rows_b):
        print(f"{ra['n_q']:>4} {ra['mel_distance']:>11.4f} "
              f"{rb['mel_distance']:>10.4f} "
              f"{ra['si_snr_db']:>9.2f} {rb['si_snr_db']:>9.2f} "
              f"{ra['stoi']:>7.3f} {rb['stoi']:>7.3f}")
    out_path = os.path.join(REPO, "docs", "finetune_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out_path}")

    if not args.export:
        return 0
    if rows_b[-1]["mel_distance"] > rows_a[-1]["mel_distance"]:
        print("finetune WORSENED full-depth mel distance; refusing to export",
              file=sys.stderr)
        return 2
    dst = os.path.join(REPO, "artifacts", args.export)
    ckpt.save_inference(
        dst, step,
        jax.tree.map(np.asarray, params_ft), jax.tree.map(np.asarray, rvq_ft),
    )
    # lineage = derivation depth from the raw training export (ADVICE r4 #3):
    # export 0, refit 1, finetune-of-refit 2 — bench.py's flagship_key orders
    # by it at equal step, so selection never falls back to mtime for
    # derived artifacts.
    lineage = int(meta.get("lineage", 1 if meta.get("refit") else 0)) + 1
    with open(os.path.join(dst, "meta.json"), "w") as f:
        json.dump({
            "config": cfg_name, "data": data_spec, "step": step,
            "run_dir": meta.get("run_dir"),
            "lineage": lineage,
            "refit": meta.get("refit"),
            "finetune": {"from": os.path.relpath(art, REPO),
                         "steps": args.steps, "lr": args.lr,
                         "batch_size": args.batch_size,
                         "selected": report["selected"],
                         "workdir": os.path.relpath(workdir, REPO)},
        }, f)
    bundle_new = api.load_model(cfg_name, checkpoint=dst, serving=True)
    pin = canonical.write_pin(bundle_new, dst)
    ok, rate, status = canonical.check_pin(bundle_new, dst)
    print(f"exported {dst} (step {step}, lineage {lineage}); pinned {pin}")
    print(f"self-check: exact={ok} rate={rate:.6f} ({status})")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
