"""Offline codebook refit of a trained serving artifact (VERDICT r3 #4).

    python scripts/refit_flagship.py [artifacts/base_fast_synthetic_40k]
        [--frames 120000] [--iters 10] [--export base_fast_synthetic_40k_refit]

Loads the artifact's serving bundle, collects a latent pool from its OWN
training data spec (meta.json), refits all codebooks by sequential residual
k-means (nsc_tpu/train/refit.py), then measures before/after:

  * pool-side: per-book usage/perplexity + per-depth residual MSE;
  * end-to-end: bitrate_sweep (mel distance, SI-SNR, NSIM, entropy bitrate)
    on a held-out batch at several depths.

Pool and eval segments honor meta.json's `segment_len` (falling back to
10 s): duration-relative generators (synthetic2) are OOD at 10 s for models
trained on ~1 s segments (docs/PERFORMANCE.md r5 "duration-relative"), so
both the k-means pool and the export gate must score the artifact at its
own training length — same rule as bench_suite config 5 and heldout_trend.

With --export NAME the refit state is written as artifacts/NAME/<step>
(same bare layout as export_flagship.py, meta.json records the refit), and
the serving path's canonical indices are re-pinned beside it. Export is
REFUSED if the refit worsened mel distance at full depth — a refit artifact
must dominate, not trade.

Run ON THE TPU HOST with the chip idle (the pin must come from the serving
graph).
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
    p.add_argument("artifact", nargs="?",
                   default=os.path.join(REPO, "artifacts", "base_fast_synthetic_40k"))
    p.add_argument("--frames", type=int, default=120_000,
                   help="latent pool size (frames)")
    p.add_argument("--iters", type=int, default=10, help="Lloyd iterations")
    p.add_argument("--pool-seed", type=int, default=7)
    p.add_argument("--eval-seed", type=int, default=1,
                   help="held-out eval batch seed (train used 0)")
    p.add_argument("--depths", default="1,2,4,8,12,16")
    p.add_argument("--export", default=None, help="artifacts/<name> to write")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import numpy as np

    from nsc_tpu import api, canonical
    from nsc_tpu.eval.sweep import bitrate_sweep
    from nsc_tpu.train import checkpoint as ckpt
    from nsc_tpu.train import refit
    from nsc_tpu.train.data import make_source
    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    art = os.path.abspath(args.artifact)
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    cfg_name, data_spec, step = meta["config"], meta["data"], int(meta["step"])
    bundle = api.load_model(cfg_name, checkpoint=art, serving=True)
    cfg = bundle.cfg

    # -- latent pool from the artifact's own training distribution ----------
    # training-length segments when the artifact records them (v2 models are
    # duration-relative; 10 s draws would refit the books on OOD latents)
    seg = int(meta.get("segment_len") or 10.0 * cfg.sample_rate)
    seg = max(cfg.hop, seg // cfg.hop * cfg.hop)
    batch = 16
    frames_per_batch = batch * (seg // cfg.hop)
    n_batches = max(1, -(-args.frames // frames_per_batch))
    src = make_source(data_spec, cfg.sample_rate, seed=args.pool_seed)
    pool = refit.collect_latents(bundle, src.batches(batch, seg), n_batches)
    print(f"latent pool: {pool.shape[0]} frames x {pool.shape[1]} dims "
          f"({n_batches} batches of {batch} x {seg/cfg.sample_rate:.0f}s "
          f"'{data_spec}' seed {args.pool_seed})")

    before_pool = refit.pool_report(bundle.rvq, pool)
    rvq2 = refit.refit_codebooks(
        jax.random.PRNGKey(args.pool_seed), bundle.rvq, pool,
        kmeans_iters=args.iters,
    )
    after_pool = refit.pool_report(rvq2, pool)
    print(f"pool usage: {before_pool['mean_usage']:.3f} -> "
          f"{after_pool['mean_usage']:.3f}; full-depth residual MSE: "
          f"{before_pool['residual_mse_per_depth'][-1]:.6f} -> "
          f"{after_pool['residual_mse_per_depth'][-1]:.6f}")

    # -- held-out end-to-end A/B --------------------------------------------
    # keep >= ~17 s of eval audio regardless of segment length (4x10 s
    # historically; 16x1.1 s for v2-trained artifacts — heldout_trend's
    # short protocol)
    depths = [int(d) for d in args.depths.split(",")]
    eval_batch = max(4, -(-int(17.6 * cfg.sample_rate) // seg))
    wavs = next(
        make_source(data_spec, cfg.sample_rate, seed=args.eval_seed)
        .batches(eval_batch, seg)
    )
    rows_a = bitrate_sweep(bundle, wavs, depths)
    bundle2 = dataclasses.replace(bundle, rvq=rvq2)
    rows_b = bitrate_sweep(bundle2, wavs, depths)

    report = {
        "artifact": os.path.relpath(art, REPO),
        "frames": int(pool.shape[0]),
        "kmeans_iters": args.iters,
        "pool_before": before_pool,
        "pool_after": after_pool,
        "sweep_before": rows_a,
        "sweep_after": rows_b,
    }
    print(f"{'n_q':>4} {'mel before':>11} {'mel after':>10} "
          f"{'usage b':>8} {'usage a':>8} {'ec-kbps b':>9} {'ec-kbps a':>9}")
    for ra, rb in zip(rows_a, rows_b):
        print(f"{ra['n_q']:>4} {ra['mel_distance']:>11.4f} "
              f"{rb['mel_distance']:>10.4f} "
              f"{np.mean(ra['book_usage']):>8.3f} "
              f"{np.mean(rb['book_usage']):>8.3f} "
              f"{ra['entropy_bitrate_bps']/1000:>9.2f} "
              f"{rb['entropy_bitrate_bps']/1000:>9.2f}")
    out_path = os.path.join(REPO, "docs", "refit_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out_path}")

    if not args.export:
        return 0
    if rows_b[-1]["mel_distance"] > rows_a[-1]["mel_distance"]:
        print("refit WORSENED full-depth mel distance; refusing to export",
              file=sys.stderr)
        return 2
    dst = os.path.join(REPO, "artifacts", args.export)
    ckpt.save_inference(dst, step, bundle.params, jax.tree.map(np.asarray, rvq2))
    with open(os.path.join(dst, "meta.json"), "w") as f:
        out_meta = {
            "config": cfg_name, "data": data_spec, "step": step,
            "run_dir": meta.get("run_dir"),
            # lineage: bench.py's flagship_key orders refit-of-refit chains
            "lineage": int(meta.get("lineage",
                                    1 if meta.get("refit") else 0)) + 1,
            "refit": {"from": os.path.relpath(art, REPO),
                      "frames": int(pool.shape[0]),
                      "kmeans_iters": args.iters,
                      "pool_seed": args.pool_seed},
        }
        # propagate the eval-protocol contract (bench_suite config 5 and
        # heldout_trend score each artifact at its own training length)
        if meta.get("segment_len"):
            out_meta["segment_len"] = int(meta["segment_len"])
        json.dump(out_meta, f)
    bundle_new = api.load_model(cfg_name, checkpoint=dst, serving=True)
    pin = canonical.write_pin(bundle_new, dst)
    ok, rate, status = canonical.check_pin(bundle_new, dst)
    print(f"exported {dst} (step {step}); pinned {pin}")
    print(f"self-check: exact={ok} rate={rate:.6f} ({status})")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
