"""Held-out trend over harvested checkpoints (scripts/heldout_trend.py, r5).

The train loop's rolling `infer/` window evicts all but the last 3 steps
and `infer_best/` selects by windowed TRAIN mel, so held-out selection
needs the harvest/ sidecar (scripts/harvest_checkpoints.sh) plus this
script. Contract checked on a tiny CPU run dir with two harvested steps:
one JSONL row per step with both protocols (training-length `mel_short`
and the historical 10 s `mel_10s`), incremental re-runs skip existing
steps, and the two checkpoints — one zeroed decoder, one trained-ish
random init — order correctly by mel_short (the zeroed decoder must be
strictly worse, i.e. the script actually evaluates the checkpoint it
labels).
"""

import json
import os
import sys

import jax

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
)

from nsc_tpu.configs import get_config
from nsc_tpu.models.codec import init_codec
from nsc_tpu.train import checkpoint as ckpt


def _zero_decoder(params):
    import jax.numpy as jnp

    return {
        k: (jax.tree.map(jnp.zeros_like, v) if k.startswith("dec") else v)
        for k, v in params.items()
    }


def test_heldout_trend_rows_and_ordering(tmp_path, capsys):
    import shutil

    import heldout_trend

    cfg = get_config("tiny_test")
    _, params, rvq = init_codec(jax.random.PRNGKey(3), cfg)
    run = tmp_path / "run"
    harvest = run / "harvest"
    harvest.mkdir(parents=True)
    # production harvest layout: harvest/<step> is the BARE orbax step dir
    # copied out of infer/<step> (harvest_checkpoints.sh) — build it the
    # same way: save via the manager, then copy the step dir out
    mgr = tmp_path / "mgr"
    ckpt.save_inference(str(mgr / "a"), 100, _zero_decoder(params), rvq)
    ckpt.save_inference(str(mgr / "b"), 200, params, rvq)
    shutil.copytree(mgr / "a" / "100", harvest / "100")
    shutil.copytree(mgr / "b" / "200", harvest / "200")

    out = run / "trend.jsonl"
    seg = 4 * cfg.hop
    args = [
        str(run), "--config", "tiny_test", "--data", "synthetic",
        "--segment-len", str(seg), "--batch-short", "2", "--batch-10s", "1",
        "--depth", str(cfg.num_quantizers), "--out", str(out),
    ]
    assert heldout_trend.main(args) == 0
    rows = [json.loads(l) for l in open(out)]
    assert [r["step"] for r in rows] == [100, 200]
    for r in rows:
        for k in ("mel_short", "si_snr_short", "mel_10s", "si_snr_10s",
                  "usage"):
            assert k in r
    by_step = {r["step"]: r for r in rows}
    # zeroed decoder (silence out) must be strictly worse than random init
    assert by_step[100]["mel_short"] > by_step[200]["mel_short"]

    # incremental rerun: no new steps -> no new rows
    capsys.readouterr()
    assert heldout_trend.main(args) == 0
    assert "no new steps" in capsys.readouterr().out
    assert len(open(out).read().splitlines()) == 2
