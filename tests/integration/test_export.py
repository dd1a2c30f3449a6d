"""Flagship export path (scripts/export_flagship.py): checkpoint copy +
meta.json + canonical pin, end-to-end on a tiny config."""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "scripts"))

from nsc_tpu import api, canonical
from nsc_tpu.configs import get_config
from nsc_tpu.models.codec import init_codec
from nsc_tpu.train import checkpoint as ckpt


def test_export_flagship_writes_artifact_meta_and_pin(tmp_path):
    import export_flagship

    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(3), cfg)
    run_dir = tmp_path / "run"
    ckpt.save_inference(str(run_dir / "infer_best"), 5, params, rvq)
    with open(run_dir / "best.json", "w") as f:
        json.dump({"metric": "loss/mel", "value": 0.5, "step": 5}, f)

    dest = tmp_path / "artifact"
    rc = export_flagship.main([
        str(run_dir), "--name", "ignored", "--config", "tiny_test",
        "--data", "synthetic2", "--dest", str(dest),
    ])
    assert rc == 0
    assert (dest / "5").is_dir()
    meta = json.load(open(dest / "meta.json"))
    assert meta["config"] == "tiny_test" and meta["data"] == "synthetic2"
    assert meta["step"] == 5

    # the pin must verify against a freshly-loaded bundle of the artifact
    bundle = api.load_model("tiny_test", checkpoint=str(dest), serving=True)
    exact, rate, _ = canonical.check_pin(bundle, str(dest))
    assert exact is True and rate == 1.0


def test_export_flagship_explicit_missing_step_fails_loudly(tmp_path):
    """An explicit --step that exists nowhere under the run must error out,
    not silently ship some other checkpoint as the named artifact (r4
    review): the artifact name encodes the step a human asked for."""
    import export_flagship

    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(3), cfg)
    run_dir = tmp_path / "run"
    ckpt.save_inference(str(run_dir / "infer_best"), 5, params, rvq)

    dest = tmp_path / "artifact"
    rc = export_flagship.main([
        str(run_dir), "--name", "ignored", "--config", "tiny_test",
        "--step", "9", "--dest", str(dest),
    ])
    assert rc == 1
    assert not dest.exists()

    # the requested step living only under infer/ (not infer_best/) must
    # still be found and exported
    ckpt.save_inference(str(run_dir / "infer"), 9, params, rvq)
    rc = export_flagship.main([
        str(run_dir), "--name", "ignored", "--config", "tiny_test",
        "--step", "9", "--dest", str(dest),
    ])
    assert rc == 0
    assert (dest / "9").is_dir()


def test_export_flagship_harvest_step_and_segment_len_meta(tmp_path):
    """r5: a --step that was evicted from infer/ but rescued into harvest/
    (scripts/harvest_checkpoints.sh, bare step-dir layout) must export, and
    --segment-len must land in meta.json so eval harnesses can score
    duration-relative generators in-distribution."""
    import shutil

    import export_flagship

    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(3), cfg)
    run_dir = tmp_path / "run"
    ckpt.save_inference(str(run_dir / "infer"), 12, params, rvq)
    # harvest layout: bare step dir (no manager wrapper)
    (run_dir / "harvest").mkdir()
    shutil.copytree(run_dir / "infer" / "12", run_dir / "harvest" / "7")

    dest = tmp_path / "artifact"
    rc = export_flagship.main([
        str(run_dir), "--name", "ignored", "--config", "tiny_test",
        "--step", "7", "--segment-len", "17600", "--dest", str(dest),
    ])
    assert rc == 0
    assert (dest / "7").is_dir()
    meta = json.load(open(dest / "meta.json"))
    assert meta["step"] == 7 and meta["segment_len"] == 17600
