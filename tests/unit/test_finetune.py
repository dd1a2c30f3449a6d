"""Decoder finetune (nsc_tpu/train/finetune.py; VERDICT r4 #1).

Contract: only the decoder moves. Encoder params, projections and codebooks
pass through BIT-IDENTICALLY, the reconstruction loss falls on a fixed
batch, and the finetune state round-trips through the checkpoint layout the
public API reads.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsc_tpu import api
from nsc_tpu.train import finetune


def _state_and_step(steps_cfg=50):
    bundle = api.load_model("tiny_test", seed=0)
    tcfg = finetune.finetune_config(steps_cfg, lr=3e-3, batch_size=4)
    state = finetune.init_finetune_state(
        jax.random.PRNGKey(7), bundle.params, bundle.rvq, tcfg
    )
    step_fn = jax.jit(finetune.make_finetune_step(bundle.model, tcfg))
    return bundle, state, step_fn


def test_finetune_moves_only_the_decoder():
    bundle, state, step_fn = _state_and_step()
    enc_before = jax.tree.map(np.asarray, state["params_g"]["encoder"])
    books_before = np.asarray(state["rvq"]["codebooks"])
    dec_before = jax.tree.map(np.asarray, state["params_g"]["decoder"])

    batch = jnp.asarray(
        np.random.RandomState(0).randn(4, 8 * bundle.cfg.hop) * 0.1,
        jnp.float32,
    )
    for _ in range(3):
        state, metrics = step_fn(state, batch)

    # frozen halves: bit-identical
    for b, a in zip(
        jax.tree.leaves(enc_before),
        jax.tree.leaves(jax.tree.map(np.asarray, state["params_g"]["encoder"])),
    ):
        assert np.array_equal(b, a)
    assert np.array_equal(books_before, np.asarray(state["rvq"]["codebooks"]))
    # trained half: moved
    moved = any(
        not np.array_equal(b, a)
        for b, a in zip(
            jax.tree.leaves(dec_before),
            jax.tree.leaves(
                jax.tree.map(np.asarray, state["params_g"]["decoder"])
            ),
        )
    )
    assert moved
    assert int(state["step"]) == 3
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"non-finite metric {k}"


def test_finetune_loss_decreases_on_fixed_batch():
    bundle, state, step_fn = _state_and_step(steps_cfg=40)
    batch = jnp.asarray(
        np.random.RandomState(1).randn(4, 8 * bundle.cfg.hop) * 0.1,
        jnp.float32,
    )
    first = None
    for _ in range(40):
        state, metrics = step_fn(state, batch)
        if first is None:
            first = float(metrics["loss/g_total"])
    assert float(metrics["loss/g_total"]) < first


def test_finetune_state_checkpoint_roundtrip(tmp_path):
    from nsc_tpu.train import checkpoint as ckpt

    bundle, state, step_fn = _state_and_step()
    batch = jnp.asarray(
        np.random.RandomState(2).randn(4, 8 * bundle.cfg.hop) * 0.1,
        jnp.float32,
    )
    state, _ = step_fn(state, batch)
    host = jax.tree.map(np.asarray, state)
    ckpt.save(str(tmp_path / "train"), 1, host)
    step, restored = ckpt.restore(str(tmp_path / "train"), state)
    assert step == 1
    for b, a in zip(jax.tree.leaves(host), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(b), np.asarray(a))
    # the inference slice reads back through the public-API layout
    ckpt.save_inference(
        str(tmp_path / "art"), 1, host["params_g"], host["rvq"]
    )
    params2, rvq2 = ckpt.restore_inference(
        str(tmp_path / "art"), bundle.params, bundle.rvq
    )
    assert np.array_equal(
        np.asarray(rvq2["codebooks"]), np.asarray(host["rvq"]["codebooks"])
    )


def test_flagship_key_lineage_orders_derived_artifacts(tmp_path):
    """ADVICE r4 #3: two derived artifacts at the same step order by lineage
    depth, not mtime."""
    import json

    from bench import flagship_key

    refit = tmp_path / "a_refit"
    ft = tmp_path / "a_ft"
    for d, meta in [
        (refit, {"step": 34000, "refit": {"from": "x"}}),
        (ft, {"step": 34000, "refit": {"from": "x"}, "lineage": 2,
              "finetune": {"from": "y"}}),
    ]:
        d.mkdir()
        (d / "meta.json").write_text(json.dumps(meta))
    # make the shallower artifact the NEWER one on disk: lineage must win
    import os
    import time

    now = time.time()
    os.utime(refit, (now + 100, now + 100))
    assert max([str(refit), str(ft)], key=flagship_key) == str(ft)


def test_finetune_keep_best_exports_best_heldout_decoder(tmp_path, monkeypatch):
    """Keep-best contract (r5; the 20k pool finetune OVERFIT and the last
    step was the worst one — docs/finetune_report.json): run_finetune scores
    the decoder on a fresh-draw held-out batch every `eval_every` steps and,
    when the best score is not the final step's, exports the best decoder to
    workdir/infer_best — which restore_inference prefers over infer/.

    The real step is monkeypatched with one that ADDS 0.02 to every decoder
    weight per step: held-out mel then degrades with the growing
    perturbation (small enough not to rail the tanh output, which would
    saturate the metric and tie the evals), so the step-2 eval wins over
    step 4 and the swap branch runs deterministically (fixed seeds)."""
    import json

    from nsc_tpu.configs import get_config
    from nsc_tpu.models.codec import init_codec
    from nsc_tpu.train import checkpoint as ckpt

    cfg = get_config("tiny_test")
    _, params, rvq = init_codec(jax.random.PRNGKey(11), cfg)
    art = tmp_path / "art"
    ckpt.save_inference(str(art), 3, params, rvq)
    (art / "meta.json").write_text(
        json.dumps({"config": "tiny_test", "data": "synthetic", "step": 3})
    )

    def degrade_factory(model, tcfg):
        def step(state, batch):
            new_params = dict(state["params_g"])
            new_params["decoder"] = jax.tree.map(
                lambda x: x + 0.02, state["params_g"]["decoder"]
            )
            metrics = {
                "loss/g_total": jnp.float32(0.0), "loss/mel": jnp.float32(0.0)
            }
            return {
                "step": state["step"] + 1, "params_g": new_params,
                "opt": state["opt"], "rvq": state["rvq"],
                "rng": state["rng"],
            }, metrics

        return step

    monkeypatch.setattr(finetune, "make_finetune_step", degrade_factory)

    wd = tmp_path / "wd"
    tcfg = finetune.finetune_config(4, batch_size=2)
    out, _ = finetune.run_finetune(
        str(art), workdir=str(wd), steps=4, tcfg=tcfg, eval_every=2,
        resume=False,
    )

    assert out["heldout/best_step"] == 2.0
    assert out["heldout/mel_best"] < out["heldout/mel_final"]
    assert ckpt.latest_step(str(wd / "infer_best")) == 2
    # restore_inference must pick infer_best; its decoder is init + 2.0
    params_b, rvq_b = ckpt.restore_inference(str(wd), params, rvq)
    expect = jax.tree.map(
        lambda x: np.asarray(x + 0.02 + 0.02), params["decoder"]
    )
    got = jax.tree.map(np.asarray, params_b["decoder"])
    for e, g in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
        assert np.allclose(e, g)
    # frozen halves ride along bit-identically
    assert np.array_equal(
        np.asarray(rvq["codebooks"]), np.asarray(rvq_b["codebooks"])
    )
