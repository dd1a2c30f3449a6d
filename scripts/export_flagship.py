"""Export a trained run's best inference checkpoint as a serving artifact.

    python scripts/export_flagship.py runs/base_fast_40k \
        --name base_fast_synthetic_40k [--config base_fast] [--step N]

Copies <run>/infer_best/<step> (falling back to <run>/infer) into
artifacts/<name>/<step> (bare orbax layout, same as the existing small_*
artifacts), then pins the serving path's canonical indices beside it
(nsc_tpu/canonical.py — the bit-exactness invariant `index_parity_exact`
is measured against; see docs/API.md "Index stability contract").

Run this ON THE TPU HOST with the chip idle: the pin must come from the
graph that serves (bf16 + Pallas kernels on TPU).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--name", required=True, help="artifacts/<name>")
    p.add_argument("--config", default="base_fast")
    p.add_argument("--step", type=int, default=None,
                   help="explicit step (default: best.json's step, else latest)")
    p.add_argument("--data", default="synthetic",
                   help="training data spec (recorded in meta.json; eval "
                   "harnesses score each checkpoint on its own training "
                   "distribution)")
    p.add_argument("--segment-len", type=int, default=None,
                   help="training segment length in SAMPLES (recorded in "
                   "meta.json; eval harnesses use it as the flagship sweep "
                   "segment so v2-style duration-relative generators are "
                   "scored in-distribution — docs/PERFORMANCE.md r5)")
    p.add_argument("--dest", default=None,
                   help="destination root (default: <repo>/artifacts/<name>)")
    args = p.parse_args(argv)

    from nsc_tpu import api, canonical
    from nsc_tpu.train import checkpoint as ckpt
    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    run_dir = os.path.abspath(args.run_dir)
    src_root = None
    explicit = args.step is not None
    step = args.step
    if step is None:
        best_path = os.path.join(run_dir, "best.json")
        if os.path.exists(best_path):
            with open(best_path) as f:
                best = json.load(f)
            step = int(best["step"])
            print(f"best.json: {best['metric']}={best['value']:.4f} "
                  f"at step {step}")
    # pass 1: the requested/best step, wherever it lives (infer_best is only
    # preferred as a tiebreak — the same step exported twice is identical)
    if step is not None:
        # harvest/ holds steps the rolling infer/ window already evicted
        # (scripts/harvest_checkpoints.sh) — held-out selection may pick one
        for sub in ("infer_best", "infer", "harvest"):
            cand = os.path.join(run_dir, sub)
            if os.path.isdir(os.path.join(cand, str(step))):
                src_root, use_step = cand, step
                break
    if src_root is None and explicit:
        # an EXPLICIT --step that doesn't exist must fail loudly, not ship
        # some other checkpoint as the named artifact
        print(f"--step {step} not found under {run_dir}/infer_best, "
              f"{run_dir}/infer, or {run_dir}/harvest", file=sys.stderr)
        return 1
    # pass 2: no (usable) requested step — fall back to the latest export
    if src_root is None:
        for sub in ("infer_best", "infer"):
            cand = os.path.join(run_dir, sub)
            latest = ckpt.latest_step(cand)
            if latest is not None:
                src_root, use_step = cand, latest
                if step is not None:
                    print(f"step {step} not in {sub}; using latest {latest}")
                break
    if src_root is None:
        print(f"no inference checkpoint under {run_dir}", file=sys.stderr)
        return 1

    dst = args.dest or os.path.join(REPO, "artifacts", args.name)
    dst_step = os.path.join(dst, str(use_step))
    if os.path.exists(dst_step):
        print(f"{dst_step} already exists; leaving checkpoint as-is")
    else:
        os.makedirs(dst, exist_ok=True)
        shutil.copytree(os.path.join(src_root, str(use_step)), dst_step)
        print(f"copied {src_root}/{use_step} -> {dst_step}")

    meta = {"config": args.config, "data": args.data, "step": use_step,
            "run_dir": os.path.relpath(run_dir, REPO)}
    if args.segment_len is not None:
        meta["segment_len"] = int(args.segment_len)
    with open(os.path.join(dst, "meta.json"), "w") as f:
        json.dump(meta, f)
    bundle = api.load_model(args.config, checkpoint=dst, serving=True)
    pin = canonical.write_pin(bundle, dst)
    ok, rate, status = canonical.check_pin(bundle, dst)
    print(f"pinned canonical indices: {pin}")
    print(f"self-check: exact={ok} rate={rate:.6f} ({status})")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
