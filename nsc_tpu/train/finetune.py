"""Decoder finetune on a frozen (encoder, quantizer) pair (VERDICT r4 #1).

The round-4 offline codebook refit (train/refit.py) cut full-depth residual
quantization MSE 4.4x, but held-out mel distance did not move: the decoder
was GAN-trained against the OLD quantizer's output distribution, so it
cannot exploit the better latent approximation the refit hands it. This
module collects that win: it finetunes ONLY the decoder, with the encoder
and the (refit) codebooks bit-frozen, against the reconstruction losses
(time-L1 + mel + multi-res STFT) on quantized latents sampled across RVQ
depths — so the single finetuned decoder improves at every bitrate
(BASELINE.json:11), not just full depth.

Design notes (TPU-first):
  * The frozen half (encoder + RVQ assignment) is computed OUTSIDE the
    gradient closure: `zq` is a constant w.r.t. the decoder parameters, so
    XLA never builds encoder backward graphs — the step costs roughly a
    decoder fwd+bwd plus one frozen encode, about half a full codec-only
    train step and a third of a GAN step.
  * Quantizer dropout is kept at training semantics (train/train.py::
    _sample_depths): per-sample random depth with prob p, else full depth.
    The RVQ prefix property means the depth-d quantized latent is exactly
    what a depth-d decode would see at inference.
  * The finetune is reconstruction-driven (no adversarial term): the full
    GAN train state of the source run is not required (inference artifacts
    carry only params_g + rvq), and the contract's measured quality axes
    (mel distance, SI-SNR, STOI, NSIM) are all signal-fidelity metrics.
    docs/PERFORMANCE.md (r5) records this framing and the measured effect.
  * Single-host/single-chip by design: the decoder fits one chip with room
    to spare and finetune runs are minutes-to-hours; DP sharding would buy
    nothing on this rig. (The full GAN pretraining path in train/train.py
    remains the mesh-parallel one.)

Checkpoint format: the finetune state is {"step", "params_g", "opt",
"rvq", "rng"} where params_g/rvq match the inference-export layout, so
`api.load_model` can read the exported artifact unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from nsc_tpu.configs import CodecConfig, TrainConfig
from nsc_tpu.losses import spectral
from nsc_tpu.models import seanet
from nsc_tpu.models.codec import NeuralSpeechCodec
from nsc_tpu.ops import rvq as rvq_ops
from nsc_tpu.train.train import _sample_depths, make_lr_schedule

FinetuneState = Dict[str, Any]


def make_finetune_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adam(
            make_lr_schedule(tcfg.lr_g, tcfg), b1=tcfg.adam_b1, b2=tcfg.adam_b2
        ),
    )


def init_finetune_state(
    key: jax.Array, params_g, rvq, tcfg: TrainConfig
) -> FinetuneState:
    opt = make_finetune_optimizer(tcfg)
    return {
        "step": jnp.zeros((), jnp.int32),
        "params_g": params_g,
        "opt": opt.init(params_g["decoder"]),
        "rvq": rvq,
        "rng": key,
    }


def make_finetune_step(model: NeuralSpeechCodec, tcfg: TrainConfig):
    """(state, batch (N, T)) -> (state, metrics). Only params_g['decoder']
    receives updates; encoder / projections / codebooks pass through
    BIT-IDENTICALLY (asserted in tests/unit/test_finetune.py)."""
    cfg = model.cfg
    opt = make_finetune_optimizer(tcfg)
    lr_schedule = make_lr_schedule(tcfg.lr_g, tcfg)
    mrstft_cfg = spectral.MultiResSTFTConfig(fft_sizes=tcfg.stft_fft_sizes)

    def finetune_step(state: FinetuneState, batch: jax.Array):
        step = state["step"]
        k_depth = jax.random.fold_in(state["rng"], step)
        params = state["params_g"]

        depth = None
        if tcfg.quantizer_dropout > 0:
            depth = _sample_depths(
                k_depth, batch.shape[0], cfg.num_quantizers,
                tcfg.quantizer_dropout,
            )

        # Frozen half, outside the grad closure: encode + quantize at the
        # sampled depths. stop_gradient is belt-and-braces — value_and_grad
        # below only differentiates w.r.t. the decoder subtree anyway.
        z = model.latents(params, batch)
        fwd = rvq_ops.forward(state["rvq"], z, depth=depth)
        zq = lax.stop_gradient(model._project_out(params, fwd.quantized))
        zq = zq.astype(model.compute_dtype)

        def loss_fn(dec_params):
            recon = seanet.apply_decoder(dec_params, zq, cfg)[..., 0]
            recon = recon.astype(jnp.float32)
            l_time = spectral.time_l1_loss(recon, batch)
            l_mel = spectral.mel_loss(
                recon, batch, sample_rate=cfg.sample_rate,
                n_fft=tcfg.mel_fft_size, hop=tcfg.mel_fft_size // 4,
                n_mels=tcfg.mel_bins, backend=tcfg.stft_backend,
            )
            l_stft = spectral.multi_res_stft_loss(
                recon, batch, mrstft_cfg, backend=tcfg.stft_backend
            )
            total = (
                tcfg.weight_l1_time * l_time
                + tcfg.weight_mel * l_mel
                + tcfg.weight_stft * l_stft
            )
            return total, {
                "loss/time_l1": l_time,
                "loss/mel": l_mel,
                "loss/stft": l_stft,
                "loss/g_total": total,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["decoder"]
        )
        metrics["grad/g_norm"] = optax.global_norm(grads)
        metrics["lr/g"] = lr_schedule(step)
        updates, new_opt = opt.update(grads, state["opt"], params["decoder"])
        new_dec = optax.apply_updates(params["decoder"], updates)
        new_params = dict(params)
        new_params["decoder"] = new_dec
        return {
            "step": step + 1,
            "params_g": new_params,
            "opt": new_opt,
            "rvq": state["rvq"],
            "rng": state["rng"],
        }, metrics

    return finetune_step


def finetune_config(
    steps: int = 20_000,
    *,
    lr: float = 1e-4,
    batch_size: int = 64,
    warmup_steps: int = 200,
) -> TrainConfig:
    """Finetune hyperparameters: lower LR than pretraining (the decoder is
    already trained; 3e-4 from scratch vs 1e-4 warm), short warmup, cosine
    decay over the run so the final decoder is a converged point rather than
    a mid-schedule snapshot."""
    return dataclasses.replace(
        TrainConfig(),
        batch_size=batch_size,
        steps=steps,
        lr_g=lr,
        warmup_steps=warmup_steps,
        lr_decay_steps=steps,
        use_gan=False,
        checkpoint_every=2500,
        full_state_every=0,  # finetune state is small; every save is full
        log_every=50,
    )


def run_finetune(
    artifact: str,
    *,
    workdir: str,
    steps: int,
    tcfg: TrainConfig,
    data_spec: str | None = None,
    resume: bool = True,
    eval_every: int = 1000,
    eval_seed: int = 2,
    keep_best: bool = True,
) -> Tuple[Dict[str, float], Dict[str, Any]]:
    """Finetune the decoder of the inference artifact at `artifact`.

    Data comes from the artifact's own meta.json training spec unless
    `data_spec` overrides it — held-out evals elsewhere (refit_report,
    bench_suite) compare like-for-like only if the distribution matches.
    Returns (last_metrics, meta). The caller exports/evaluates; this
    function only trains and checkpoints (resumable via `workdir`).

    Held-out keep-best (r5): the first 20k-step pool finetune OVERFIT —
    training mel fell 0.268->0.237 while held-out mel ROSE 0.2682->0.2793
    at every depth (docs/finetune_report.json, 2048-segment pool = ~625
    epochs), so the export gate refused it. Every `eval_every` steps the
    decoder is scored on a FRESH-DRAW validation batch (`eval_seed`, drawn
    from the pool-stripped spec so it cannot live in the training pool;
    seed 2 by default — disjoint from the seed-1 gate batch the caller
    uses, so selection and gating stay separate draws). The selection
    metric is the same log-mel RMS as eval/quality.mel_distance
    (1024/256/80), computed in-jit; the encoder + books are frozen, so the
    eval's quantized latents are constant and precomputed once. If the
    best-seen decoder beats the final one, it is exported to
    `workdir/infer_best/<best_step>` — which train/checkpoint.py::
    restore_inference prefers over `infer/` — with one bundled d2h pull
    (best params are held as device copies; the relay's ~1-2 MB/s bulk
    d2h makes per-improvement saves unaffordable). On resume, best
    tracking restarts from the resumed step's eval.
    """
    import json
    import os
    import threading
    import time

    import numpy as np

    from nsc_tpu import api
    from nsc_tpu.train import checkpoint as ckpt
    from nsc_tpu.train import data as data_lib
    from nsc_tpu.train.loop import MetricsLogger
    from nsc_tpu.utils.cache import enable_compilation_cache
    from nsc_tpu.utils.liveness import Heartbeat, device_liveness_check
    from nsc_tpu.utils.transfer import bundled_snapshot

    device_liveness_check()
    enable_compilation_cache()

    with open(os.path.join(artifact, "meta.json")) as f:
        meta = json.load(f)
    cfg_name = meta["config"]
    data_spec = data_spec or meta["data"]
    # serving=False: the finetune runs the f32 reference lowerings (the
    # differentiable parity path); the serving kernels are inference-only.
    bundle = api.load_model(cfg_name, checkpoint=artifact)
    model = bundle.model

    state = init_finetune_state(
        jax.random.PRNGKey(tcfg.seed + 4242), bundle.params, bundle.rvq, tcfg
    )
    start_step = 0
    train_dir = os.path.join(workdir, "train")
    if resume and ckpt.latest_step(train_dir) is not None:
        start_step, state = ckpt.restore(train_dir, state)
        print(f"finetune: resumed from step {start_step}")
    frozen_books = np.asarray(state["rvq"]["codebooks"])

    step_fn = jax.jit(make_finetune_step(model, tcfg), donate_argnums=0)

    cfg = model.cfg
    seg = int(tcfg.segment_seconds * cfg.sample_rate) // cfg.hop * cfg.hop
    source = data_lib.make_source(data_spec, cfg.sample_rate, tcfg.seed)
    if hasattr(source, "set_cache_dir"):
        source.set_cache_dir(workdir)
    batches = data_lib.Prefetcher(source.batches(tcfg.batch_size, seg))
    logger = MetricsLogger(workdir)

    # ---- held-out validation for keep-best selection -----------------------
    # Pool-stripped spec: a ":pool=N" train spec serves crops of a FIXED
    # pool; stripping it draws fresh segments the pool never contained.
    heldout_spec = (data_spec or meta["data"]).partition(":pool=")[0]
    seg_e = int(2.0 * cfg.sample_rate) // cfg.hop * cfg.hop
    eval_wavs = jnp.asarray(
        next(
            data_lib.make_source(heldout_spec, cfg.sample_rate, eval_seed)
            .batches(8, seg_e)
        ),
        jnp.float32,
    )
    # Frozen half of the eval, computed once: full-depth quantized latents.
    z_e = jax.jit(model.latents)(state["params_g"], eval_wavs)
    fwd_e = rvq_ops.forward(state["rvq"], z_e)
    zq_e = model._project_out(state["params_g"], fwd_e.quantized)
    zq_e = jnp.asarray(zq_e, model.compute_dtype)

    from nsc_tpu.ops import stft as stft_ops

    mel_ref_e = stft_ops.mel_spectrogram(
        eval_wavs, cfg.sample_rate, 1024, 256, 80
    )

    @jax.jit
    def heldout_mel(dec_params) -> jax.Array:
        """Same metric as eval/quality.mel_distance: RMS log-mel error."""
        recon = seanet.apply_decoder(dec_params, zq_e, cfg)[..., 0]
        recon = recon.astype(jnp.float32)[:, : eval_wavs.shape[-1]]
        mel_d = stft_ops.mel_spectrogram(recon, cfg.sample_rate, 1024, 256, 80)
        return jnp.sqrt(jnp.mean((mel_d - mel_ref_e) ** 2))

    best_mel = float("inf")
    best_step = -1
    best_dec = None  # device-side copy (step_fn donates state buffers)
    last_hm = float("nan")

    # Same async-writer checkpointing scheme as train/loop.py, simplified:
    # the finetune state is ~4x smaller than a GAN state (no discriminators,
    # one optimizer), every save is full (resume granularity == cadence).
    async_ckpt = jax.default_backend() == "tpu"
    writer: list = [None]
    writer_err: list = []

    def _write(snap, step1):
        try:
            host_state = snap.materialize()
            ckpt.save(train_dir, step1, host_state, max_to_keep=2)
            ckpt.save_inference(
                os.path.join(workdir, "infer"), step1,
                host_state["params_g"], host_state["rvq"],
            )
        except BaseException as e:
            writer_err.append(e)

    hb = Heartbeat() if async_ckpt else None
    metrics: Dict[str, float] = {}
    t0 = time.time()
    try:
        pending = jnp.asarray(next(batches))
        for step in range(start_step, steps):
            batch = pending
            if step + 1 < steps:
                pending = jnp.asarray(next(batches))
            state, metrics = step_fn(state, batch)
            if (step + 1) % tcfg.log_every == 0 or step + 1 == steps:
                m = {k: float(v) for k, v in metrics.items()}
                if hb is not None:
                    hb.beat(step + 1)
                rate = tcfg.log_every / max(time.time() - t0, 1e-9)
                m["steps_per_sec"] = rate
                t0 = time.time()
                logger.log(step + 1, m)
                print(
                    f"finetune step {step+1}: g={m['loss/g_total']:.4f} "
                    f"mel={m['loss/mel']:.4f} ({rate:.2f} it/s)", flush=True,
                )
            if (step + 1) % eval_every == 0 or step + 1 == steps:
                hm = float(heldout_mel(state["params_g"]["decoder"]))
                last_hm = hm
                logger.log(step + 1, {"heldout/mel": hm})
                marker = ""
                if hm < best_mel:
                    best_mel, best_step = hm, step + 1
                    best_dec = jax.tree.map(
                        jnp.copy, state["params_g"]["decoder"]
                    )
                    marker = " (best)"
                print(
                    f"finetune heldout step {step+1}: mel={hm:.4f}{marker}",
                    flush=True,
                )
            if (step + 1) % tcfg.checkpoint_every == 0 or step + 1 == steps:
                if hb is not None:
                    hb.beat(step + 1)
                if writer[0] is not None:
                    writer[0].join()
                if writer_err:
                    raise writer_err[0]
                snap = bundled_snapshot(state)
                if async_ckpt and step + 1 < steps:
                    writer[0] = threading.Thread(
                        target=_write, args=(snap, step + 1)
                    )
                    writer[0].start()
                else:
                    if hb is not None:
                        hb.stop()
                    _write(snap, step + 1)
                    if writer_err:
                        raise writer_err[0]
    finally:
        if hb is not None:
            hb.stop()
    if writer[0] is not None:
        writer[0].join()
    if writer_err:
        raise writer_err[0]
    batches.close()
    logger.close()

    # Freeze invariant, asserted at run end: books did not move.
    books_after = np.asarray(state["rvq"]["codebooks"])
    assert np.array_equal(frozen_books, books_after), (
        "finetune moved the frozen codebooks — invariant violated"
    )

    out = {k: float(v) for k, v in metrics.items()}
    if best_step > 0:
        out["heldout/mel_best"] = best_mel
        out["heldout/best_step"] = float(best_step)
        out["heldout/mel_final"] = last_hm
    if keep_best and best_dec is not None and best_mel < last_hm:
        # The final decoder is not the best one seen — export the best to
        # infer_best/ (restore_inference prefers it). One bundled pull.
        best_params = dict(state["params_g"])
        best_params["decoder"] = best_dec
        snap = bundled_snapshot({"params_g": best_params, "rvq": state["rvq"]})
        host = snap.materialize()
        ckpt.save(
            os.path.join(workdir, "infer_best"), best_step,
            {
                "params_g": jax.tree.map(np.asarray, host["params_g"]),
                "rvq": jax.tree.map(np.asarray, host["rvq"]),
            },
            max_to_keep=1,
        )
        print(
            f"finetune keep-best: step {best_step} heldout mel "
            f"{best_mel:.4f} < final {last_hm:.4f} -> infer_best/", flush=True,
        )
    return out, meta
