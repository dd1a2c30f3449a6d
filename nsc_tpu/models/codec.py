"""The codec model: encoder + RVQ + decoder (SURVEY.md §3 #7; call stacks
§4.1-4.2).

`NeuralSpeechCodec` is a thin static composition — all state lives in two
pytrees passed explicitly (functional, jit/shard_map-friendly):

  params = {'encoder': ..., 'decoder': ...}   # gradient-trained
  rvq    = {'codebooks', 'ema_count', 'ema_sum'}  # EMA-updated, non-gradient

The class holds only the (hashable, static) CodecConfig, so methods can be
jitted with the model as a static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nsc_tpu.configs import CodecConfig
from nsc_tpu.models import seanet
from nsc_tpu.ops import rvq as rvq_ops

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeuralSpeechCodec:
    cfg: CodecConfig

    # -- inference ---------------------------------------------------------

    def encode(
        self, params: Params, rvq: rvq_ops.RVQState, wav: jax.Array,
        n_q: Optional[int] = None,
    ) -> jax.Array:
        """(N, T) or (N, T, 1) waveform -> (N, F, n_q) int32 indices."""
        return rvq_ops.quantize(
            rvq, self.latents(params, wav), n_q=n_q,
            backend=self.cfg.rvq_backend,
        )

    def latents(self, params: Params, wav: jax.Array) -> jax.Array:
        """(N, T) waveform -> (N, F, D) PRE-quantization latents (projected
        into codebook space for factorized configs) — the distribution the
        codebooks must tile; used by data-driven codebook init
        (ops/rvq.py::init_codebooks_from_data)."""
        x = self._shape_wav(wav)
        z = seanet.apply_encoder(params["encoder"], x, self.cfg)
        return self._project_in(params, z)

    def decode(
        self, params: Params, rvq: rvq_ops.RVQState, indices: jax.Array,
        n_q: Optional[int] = None,
    ) -> jax.Array:
        """(N, F, n_q) indices -> (N, F*hop) waveform."""
        z = rvq_ops.dequantize(
            rvq, indices, n_q=n_q, backend=self.cfg.rvq_backend
        )
        z = self._project_out(params, z)
        z = z.astype(self.compute_dtype)
        wav = seanet.apply_decoder(params["decoder"], z, self.cfg)
        return wav[..., 0].astype(jnp.float32)

    def reconstruct(
        self, params: Params, rvq: rvq_ops.RVQState, wav: jax.Array,
        n_q: Optional[int] = None,
    ) -> jax.Array:
        """encode -> decode in one jittable graph (the RTF benchmark path,
        BASELINE.json:2)."""
        return self.decode(params, rvq, self.encode(params, rvq, wav, n_q), n_q)

    def decode_latents(self, params: Params, z: jax.Array) -> jax.Array:
        """(N, F, D) codebook-space latents -> (N, F*hop) waveform, skipping
        quantization. `decode_latents(latents(wav))` is the model's
        INFINITE-BITRATE autoencoder bound: no RVQ depth can reconstruct
        better than the un-quantized latent path, so this is the
        rate-distortion ceiling any depth sweep saturates toward
        (scripts/rd_ceiling.py; VERDICT r4 next #3)."""
        z = self._project_out(params, z.astype(jnp.float32))
        z = z.astype(self.compute_dtype)
        wav = seanet.apply_decoder(params["decoder"], z, self.cfg)
        return wav[..., 0].astype(jnp.float32)

    # -- training ----------------------------------------------------------

    def forward(
        self,
        params: Params,
        rvq: rvq_ops.RVQState,
        wav: jax.Array,
        *,
        depth: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, rvq_ops.RVQForward, jax.Array]:
        """Full differentiable pass for training (SURVEY.md §4.3).

        Returns (reconstructed_wav (N,T), rvq_forward, latents (N,F,D)).
        Gradients flow encoder<->decoder through the RVQ straight-through
        estimator; EMA stats ride along in rvq_forward.
        """
        x = self._shape_wav(wav)
        z_lat = seanet.apply_encoder(params["encoder"], x, self.cfg)
        z = self._project_in(params, z_lat)
        fwd = rvq_ops.forward(rvq, z, depth=depth, axis_name=axis_name)
        zq = self._project_out(params, fwd.quantized).astype(self.compute_dtype)
        recon = seanet.apply_decoder(params["decoder"], zq, self.cfg)
        return recon[..., 0], fwd, z

    # -- helpers -----------------------------------------------------------

    @property
    def compute_dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @property
    def factorized(self) -> bool:
        return self.cfg.codebook_dim != self.cfg.latent_dim

    def _project_in(self, params: Params, z: jax.Array) -> jax.Array:
        """latent -> codebook space (factorized codes; identity otherwise)."""
        if not self.factorized:
            return z
        return jnp.dot(
            z.astype(jnp.float32), params["proj_in"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    def _project_out(self, params: Params, zq: jax.Array) -> jax.Array:
        if not self.factorized:
            return zq
        return jnp.dot(
            zq.astype(jnp.float32), params["proj_out"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    def _shape_wav(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 2:
            wav = wav[..., None]
        if wav.ndim != 3 or wav.shape[-1] != self.cfg.channels:
            raise ValueError(
                f"expected (N, T) or (N, T, {self.cfg.channels}), got {wav.shape}"
            )
        return wav.astype(self.compute_dtype)

    def frames_for_samples(self, t: int) -> int:
        return (t - 1) // self.cfg.hop + 1


def init_codec(
    key: jax.Array, cfg: CodecConfig
) -> Tuple[NeuralSpeechCodec, Params, rvq_ops.RVQState]:
    ke, kd, kq, kp = jax.random.split(key, 4)
    params = {
        "encoder": seanet.init_encoder(ke, cfg),
        "decoder": seanet.init_decoder(kd, cfg),
    }
    if cfg.codebook_dim != cfg.latent_dim:
        k1, k2 = jax.random.split(kp)
        s_in = 1.0 / jnp.sqrt(cfg.latent_dim)
        s_out = 1.0 / jnp.sqrt(cfg.codebook_dim)
        params["proj_in"] = (
            jax.random.normal(k1, (cfg.latent_dim, cfg.codebook_dim)) * s_in
        )
        params["proj_out"] = (
            jax.random.normal(k2, (cfg.codebook_dim, cfg.latent_dim)) * s_out
        )
    rvq = rvq_ops.init_rvq(kq, cfg)
    return NeuralSpeechCodec(cfg), params, rvq


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
