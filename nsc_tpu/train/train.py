"""Training harness (SURVEY.md §3 #15, call stacks §4.3-4.4).

One jittable `train_step` covering both contract modes:
  * codec-only (BASELINE.json:9): multi-res STFT/mel + time-L1 + commitment.
  * full GAN (BASELINE.json:10): + MS/MP discriminators, least-squares
    adversarial and feature-matching losses, two optimizers (G and D).

TPU-first structure:
  * The whole step (G forward, D update, G update, EMA codebook fold) is one
    XLA program; under data parallelism it runs inside shard_map with
    gradient psum over the 'data' mesh axis (nsc_tpu/parallel/mesh.py) —
    the ICI-collective equivalent of the reference's DDP (SURVEY.md §3 #17).
  * RVQ EMA statistics are psum'd BEFORE the EMA fold and the dead-code
    reseed pool is all_gather'd, so codebooks stay bit-identical across
    replicas (SURVEY.md §8 hard-part #2).
  * Quantizer dropout: per-sample random RVQ depth so one trained model
    serves every bitrate (BASELINE.json:11).
  * D sees real and fake as a single doubled batch -> one big MXU pass
    instead of two half-size ones.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from nsc_tpu.configs import CodecConfig, TrainConfig
from nsc_tpu.losses import gan as gan_losses
from nsc_tpu.losses import spectral
from nsc_tpu.models import discriminators as disc
from nsc_tpu.models.codec import NeuralSpeechCodec, init_codec

TrainState = Dict[str, Any]  # pytree; see init_train_state


def make_lr_schedule(base_lr: float, tcfg: TrainConfig) -> optax.Schedule:
    """Linear warmup -> optional cosine decay to base_lr * lr_end_factor
    (family-standard practice for 100k+-step GAN runs); constant when both
    warmup_steps and lr_decay_steps are 0 (test configs)."""
    if tcfg.warmup_steps <= 0 and tcfg.lr_decay_steps <= 0:
        return optax.constant_schedule(base_lr)
    warmup = max(tcfg.warmup_steps, 0)
    if tcfg.lr_decay_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=max(warmup, 1),
            decay_steps=max(tcfg.lr_decay_steps, warmup + 1),
            end_value=base_lr * tcfg.lr_end_factor,
        )
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup),
            optax.constant_schedule(base_lr),
        ],
        boundaries=[warmup],
    )


def make_optimizers(tcfg: TrainConfig) -> Tuple[optax.GradientTransformation, ...]:
    def make(lr):
        return optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adam(
                make_lr_schedule(lr, tcfg), b1=tcfg.adam_b1, b2=tcfg.adam_b2
            ),
        )

    return make(tcfg.lr_g), make(tcfg.lr_d)


def init_train_state(
    key: jax.Array, cfg: CodecConfig, tcfg: TrainConfig
) -> Tuple[NeuralSpeechCodec, TrainState]:
    kg, kd, kr = jax.random.split(key, 3)
    model, params_g, rvq = init_codec(kg, cfg)
    params_d = disc.init_discriminators(
        kd, tcfg.disc_width_mult,
        periods=tcfg.mpd_periods, msd_scales=tcfg.msd_scales,
    )
    opt_g, opt_d = make_optimizers(tcfg)
    return model, {
        "step": jnp.zeros((), jnp.int32),
        "params_g": params_g,
        "params_d": params_d,
        "opt_g": opt_g.init(params_g),
        "opt_d": opt_d.init(params_d),
        "rvq": rvq,
        "rng": kr,
    }


def _sample_depths(
    key: jax.Array, n: int, n_q: int, dropout_p: float
) -> jax.Array:
    """Quantizer dropout: with prob p a sample trains at a random depth in
    [1, n_q]; otherwise full depth."""
    k1, k2 = jax.random.split(key)
    rand_depth = jax.random.randint(k1, (n,), 1, n_q + 1)
    use_rand = jax.random.bernoulli(k2, dropout_p, (n,))
    return jnp.where(use_rand, rand_depth, n_q)


def make_train_step(
    model: NeuralSpeechCodec,
    tcfg: TrainConfig,
    *,
    axis_name: Optional[str] = None,
):
    """Build the jittable train step: (state, batch (N,T)) -> (state, metrics).

    With axis_name set, the step must run inside shard_map over a mesh with
    that axis; gradients, EMA stats and metrics are psum/pmean'd over it.
    """
    cfg = model.cfg
    opt_g, opt_d = make_optimizers(tcfg)
    lr_schedule_g = make_lr_schedule(tcfg.lr_g, tcfg)
    mrstft_cfg = spectral.MultiResSTFTConfig(fft_sizes=tcfg.stft_fft_sizes)

    def pmean(x):
        return lax.pmean(x, axis_name) if axis_name else x

    def g_loss_fn(params_g, params_d, rvq, batch, depth, adv_on):
        recon, fwd, z = model.forward(
            params_g, rvq, batch, depth=depth, axis_name=axis_name
        )
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
            + tcfg.weight_commit * fwd.commit_loss
        )
        metrics = {
            "loss/time_l1": l_time,
            "loss/mel": l_mel,
            "loss/stft": l_stft,
            "loss/commit": fwd.commit_loss,
        }
        if tcfg.use_gan:
            both = jnp.concatenate([batch, recon], axis=0)  # one MXU pass
            outs = disc.apply_discriminators(
                params_d, both, periods=tcfg.mpd_periods
            )
            n = batch.shape[0]
            real = [(lg[:n], [f[:n] for f in fs]) for lg, fs in outs]
            fake = [(lg[n:], [f[n:] for f in fs]) for lg, fs in outs]
            l_adv = gan_losses.generator_adversarial_loss(fake)
            l_fm = gan_losses.feature_matching_loss(real, fake)
            total = total + adv_on * (
                tcfg.weight_adv * l_adv + tcfg.weight_fm * l_fm
            )
            metrics["loss/adv_g"] = l_adv
            metrics["loss/fm"] = l_fm
        metrics["loss/g_total"] = total
        return total, (metrics, fwd, z, recon)

    def d_loss_fn(params_d, batch, fake_wav):
        both = jnp.concatenate([batch, fake_wav], axis=0)
        outs = disc.apply_discriminators(params_d, both, periods=tcfg.mpd_periods)
        n = batch.shape[0]
        real = [(lg[:n], [f[:n] for f in fs]) for lg, fs in outs]
        fake = [(lg[n:], [f[n:] for f in fs]) for lg, fs in outs]
        return gan_losses.discriminator_loss(real, fake)

    def train_step(state: TrainState, batch: jax.Array):
        step = state["step"]
        base = jax.random.fold_in(state["rng"], step)
        # k_reseed must be REPLICATED: all replicas must pick identical
        # dead-code reseed candidates (from the all_gather'd pool) or
        # codebooks diverge. Only per-sample randomness folds in the
        # replica id.
        k_reseed, k_local = jax.random.split(base)
        if axis_name is not None:
            k_local = jax.random.fold_in(k_local, lax.axis_index(axis_name))
        k_depth = k_local

        depth = None
        if tcfg.quantizer_dropout > 0:
            depth = _sample_depths(
                k_depth, batch.shape[0], cfg.num_quantizers, tcfg.quantizer_dropout
            )
        adv_on = (step >= tcfg.disc_start_step).astype(jnp.float32)

        # --- generator update ---
        (g_total, (metrics, fwd, z, recon)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state["params_g"], state["params_d"], state["rvq"], batch, depth, adv_on)
        if axis_name is not None:
            # JAX shard_map auto-psums cotangents of replicated params, so
            # per-shard grads already hold the cross-replica SUM of
            # local-mean gradients; dividing by axis size yields the
            # global-batch-mean gradient (== single-device step; verified in
            # tests/integration/test_training.py::test_dp_step_equals_single_device).
            inv = 1.0 / lax.axis_size(axis_name)
            g_grads = jax.tree.map(lambda g: g * inv, g_grads)
        metrics["grad/g_norm"] = optax.global_norm(g_grads)
        g_updates, new_opt_g = opt_g.update(g_grads, state["opt_g"], state["params_g"])
        new_params_g = optax.apply_updates(state["params_g"], g_updates)

        # --- EMA codebook fold (stats already psum'd inside forward) ---
        from nsc_tpu.ops import rvq as rvq_ops

        pool = lax.stop_gradient(z).reshape(-1, z.shape[-1])
        candidates = rvq_ops.sample_reseed_candidates(
            k_reseed, pool, fwd.counts.shape[0], cfg.codebook_size,
            axis_name=axis_name,
        )
        new_rvq, rvq_metrics = rvq_ops.ema_update(
            state["rvq"], fwd.counts, fwd.sums,
            decay=cfg.ema_decay, eps=cfg.ema_eps,
            dead_threshold=cfg.threshold_dead_code,
            reseed_candidates=candidates,
            return_metrics=True,
        )
        metrics["rvq/perplexity"] = jnp.mean(
            rvq_ops.codebook_perplexity(fwd.counts)
        )
        metrics["rvq/usage"] = jnp.mean(fwd.usage)
        # churn observability: fraction of codes reseeded this step — must
        # decay toward ~0 as codebooks settle (tests/integration/test_training.py)
        metrics["rvq/reseed_frac"] = rvq_metrics["reseed_frac"]
        metrics["lr/g"] = lr_schedule_g(step)

        # --- discriminator update ---
        new_params_d, new_opt_d = state["params_d"], state["opt_d"]
        if tcfg.use_gan:
            fake = lax.stop_gradient(recon)
            d_total, d_grads = jax.value_and_grad(d_loss_fn)(
                state["params_d"], batch, fake
            )
            if axis_name is not None:
                d_grads = jax.tree.map(
                    lambda g: g / lax.axis_size(axis_name), d_grads
                )
            # gate the update until disc_start_step (scale updates by adv_on)
            d_grads = jax.tree.map(lambda x: x * adv_on, d_grads)
            d_updates, new_opt_d = opt_d.update(d_grads, state["opt_d"], state["params_d"])
            new_params_d = optax.apply_updates(state["params_d"], d_updates)
            metrics["loss/d_total"] = d_total

        metrics = {k: pmean(v) for k, v in metrics.items()}
        new_state = {
            "step": step + 1,
            "params_g": new_params_g,
            "params_d": new_params_d,
            "opt_g": new_opt_g,
            "opt_d": new_opt_d,
            "rvq": new_rvq,
            "rng": state["rng"],
        }
        return new_state, metrics

    return train_step
