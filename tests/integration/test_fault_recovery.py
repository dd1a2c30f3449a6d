"""Fault injection / elastic recovery (SURVEY.md §6 failure-detection row):
kill training after N steps (simulated by process-style re-entry into
loop.run), restart, and verify it resumes from the latest checkpoint and
continues to completion."""

import json
import os

import numpy as np

from nsc_tpu.configs import TrainConfig, get_config
from nsc_tpu.train import loop as loop_lib


def _tcfg():
    return TrainConfig(
        batch_size=8,  # divisible by the 8 fake devices (loop uses the mesh)
        segment_seconds=0.032,
        use_gan=False,
        disc_width_mult=1 / 16,
        stft_fft_sizes=(128, 64),
        mel_fft_size=128,
        mel_bins=10,
        quantizer_dropout=0.0,
        log_every=1,
        checkpoint_every=3,
    )


def test_crash_and_resume(tmp_path):
    cfg = get_config("tiny_test")
    wd = str(tmp_path / "run")

    # phase 1: "crash" after 4 steps (checkpoint written at step 3)
    loop_lib.run(cfg, _tcfg(), workdir=wd, data_spec="synthetic", steps=4)
    from nsc_tpu.train import checkpoint as ckpt

    assert ckpt.latest_step(os.path.join(wd, "train")) == 4  # final save too

    # phase 2: restart with a higher target; must resume, not restart at 0
    loop_lib.run(cfg, _tcfg(), workdir=wd, data_spec="synthetic", steps=7)
    assert ckpt.latest_step(os.path.join(wd, "train")) == 7

    rows = [
        json.loads(line)
        for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    steps = [r["step"] for r in rows]
    # phase 2 logged only steps 5..7 (no step repeated from scratch)
    assert max(steps) == 7
    assert sorted(set(steps)) == steps, "steps re-ran from zero after resume"
    assert all(np.isfinite(r["loss/g_total"]) for r in rows)

    # inference export is loadable through the public API
    import nsc_tpu

    bundle = nsc_tpu.load_model("tiny_test", checkpoint=wd)
    idx = nsc_tpu.encode(bundle, np.zeros(cfg.hop * 8, np.float32))
    assert idx.shape == (8, cfg.num_quantizers)

    # best-metric export: written whenever TrainConfig.best_metric improved,
    # with a sidecar recording metric/value/step (survives restarts)
    assert ckpt.latest_step(os.path.join(wd, "infer_best")) is not None
    with open(os.path.join(wd, "best.json")) as f:
        best = json.load(f)
    assert best["metric"] == "loss/mel"
    assert np.isfinite(best["value"]) and 1 <= best["step"] <= 7


def test_rss_limit_exits_cleanly_with_resumable_full_save(tmp_path, monkeypatch):
    """Host-RSS guard (2026-08-19 OOM incident: relay transfer-buffer leak
    grew the flagship train process to 130 GB and the OOM killer SIGKILLed
    it, stranding the device claim): when RSS exceeds NSC_RSS_EXIT_GB at a
    checkpoint boundary, the loop must take a FULL synchronous save and exit
    EXIT_RSS_LIMIT — and a relaunch must resume from that save."""
    import pytest

    from nsc_tpu.train import checkpoint as ckpt
    from nsc_tpu.utils.liveness import EXIT_RSS_LIMIT, host_rss_gb

    assert host_rss_gb() > 0.05, "statm-based RSS reading looks broken"

    cfg = get_config("tiny_test")
    wd = str(tmp_path / "run")
    # any running Python process exceeds 1 MB RSS -> fires at the first
    # checkpoint boundary (step 3), NOT at the final step (guarded out)
    monkeypatch.setenv("NSC_RSS_EXIT_GB", "0.001")
    with pytest.raises(SystemExit) as e:
        loop_lib.run(cfg, _tcfg(), workdir=wd, data_spec="synthetic", steps=7)
    assert e.value.code == EXIT_RSS_LIMIT
    mgr = ckpt._manager(os.path.join(wd, "train"))
    assert 3 in mgr.all_steps(), "exit save was not a resumable FULL save"

    # supervisor relaunch: guard off (healthy RSS) -> resumes, completes
    monkeypatch.setenv("NSC_RSS_EXIT_GB", "0")
    loop_lib.run(cfg, _tcfg(), workdir=wd, data_spec="synthetic", steps=7)
    assert ckpt.latest_step(os.path.join(wd, "train")) == 7
    steps = [
        json.loads(line)["step"]
        for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    assert sorted(set(steps)) == steps, "steps re-ran from zero after resume"


def test_rss_exit_limit_default_and_override(monkeypatch):
    """Env contract: explicit NSC_RSS_EXIT_GB wins, 0 disables; the default
    is relative to MemTotal and disabled on small hosts."""
    from nsc_tpu.utils import liveness

    monkeypatch.setenv("NSC_RSS_EXIT_GB", "12.5")
    assert liveness.rss_exit_limit_gb() == 12.5
    monkeypatch.setenv("NSC_RSS_EXIT_GB", "0")
    assert liveness.rss_exit_limit_gb() is None
    monkeypatch.delenv("NSC_RSS_EXIT_GB")
    limit = liveness.rss_exit_limit_gb()
    # this host either qualifies (>=32 GB -> 80% of MemTotal) or doesn't
    if limit is not None:
        assert limit >= 0.8 * 32


def test_first_checkpoint_boundary_is_a_full_save(tmp_path):
    """A fresh run must leave a resumable FULL save at its first checkpoint
    boundary even when full_state_every is larger: a crash in the first
    full_state_every steps then costs checkpoint_every steps, not the whole
    run (2026-08-17 wedge: 600 steps lost with the first full save scheduled
    at 2000)."""
    import dataclasses

    cfg = get_config("tiny_test")
    wd = str(tmp_path / "run")
    tcfg = dataclasses.replace(_tcfg(), checkpoint_every=2, full_state_every=100)
    loop_lib.run(cfg, tcfg, workdir=wd, data_spec="synthetic", steps=5)
    from nsc_tpu.train import checkpoint as ckpt

    mgr = ckpt._manager(os.path.join(wd, "train"))
    steps = sorted(mgr.all_steps())
    # full saves: first boundary (2, forced), final (5); boundary 4 stays
    # inference-only (cadence 100 not yet reached since the step-2 full save)
    assert 2 in steps, f"no full save at the first boundary (got {steps})"
    assert 4 not in steps
    assert 5 in steps
