"""Rate-distortion ceiling analysis (scripts/rd_ceiling.py; VERDICT r4 #3).

The script bounds the bitrate-sweep's quality axis with an infinite-bitrate
autoencoder ceiling and a no-information anchor. Contract checked here on a
tiny CPU artifact: it runs end-to-end, writes a well-formed report, the
sweep rows carry the per-depth quantization gap, and the gap is computed
against the ceiling row (mel_gap == sweep mel − ceiling mel).
"""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
)

from nsc_tpu.configs import get_config
from nsc_tpu.models.codec import init_codec
from nsc_tpu.train import checkpoint as ckpt


def test_rd_ceiling_report_well_formed(tmp_path):
    import rd_ceiling

    cfg = get_config("tiny_test")
    _, params, rvq = init_codec(jax.random.PRNGKey(5), cfg)
    art = tmp_path / "art"
    ckpt.save_inference(str(art), 7, params, rvq)
    (art / "meta.json").write_text(
        json.dumps({"config": "tiny_test", "data": "synthetic", "step": 7})
    )

    out = tmp_path / "rd.json"
    rc = rd_ceiling.main([
        str(art), "--batch", "2", "--seconds", "2", "--depths", "1,2",
        "--out", str(out),
    ])
    assert rc == 0
    rep = json.load(open(out))
    assert rep["data"] == "synthetic"
    assert rep["eval_frames"] == 2 * (
        (int(2.0 * cfg.sample_rate) // cfg.hop * cfg.hop) // cfg.hop
    )
    ceiling = rep["autoencoder_ceiling"]
    anchor = rep["no_information_anchor"]
    for row in (ceiling, anchor):
        assert np.isfinite(row["mel_distance"])
        assert np.isfinite(row["si_snr_db"])
    assert [r["n_q"] for r in rep["sweep"]] == [1, 2]
    for r in rep["sweep"]:
        assert abs(
            r["mel_gap_vs_ceiling"]
            - (r["mel_distance"] - ceiling["mel_distance"])
        ) < 1e-5
