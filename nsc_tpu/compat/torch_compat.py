"""Torch checkpoint -> JAX pytree converter (SURVEY.md §3 #11; the
BASELINE.json:5 contract "match the reference PyTorch checkpoints bit-exactly
on codebook indices" requires loading those checkpoints).

The name-mapping table below is THE deliverable (SURVEY.md §6 checkpoint
row): each converter rule maps a torch module path to a pytree path plus the
layout transpose. It is exercised end-to-end by tests/parity/ — torch twin
and JAX model produce bit-identical codebook indices from converted weights.
If the real NSC checkpoints ever appear, only the key prefixes in
`_TORCH_KEY_ALIASES` should need adjusting (SURVEY.md §0).

Layout rules:
  Conv1d weight          (Cout, Cin, K) -> (K, Cin, Cout)   transpose(2, 1, 0)
  ConvTranspose1d weight (Cin, Cout, K) -> (K, Cin, Cout)   transpose(2, 0, 1)
  weight-norm g          (Cout, 1, 1) / (1, Cout, 1) -> (Cout,)
  snake alpha            (C,) -> (C,)
  rvq codebooks          (n_q, K, D) -> (n_q, K, D)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from nsc_tpu.configs import CodecConfig

# alternate key spellings a real reference checkpoint might use
_TORCH_KEY_ALIASES: Dict[str, str] = {}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


class ConversionError(KeyError):
    pass


def _get(sd: Mapping[str, Any], key: str) -> np.ndarray:
    key = _TORCH_KEY_ALIASES.get(key, key)
    if key not in sd:
        raise ConversionError(
            f"torch checkpoint missing key {key!r} "
            f"(have e.g. {sorted(sd)[:5]}...)"
        )
    return _np(sd[key])


def _conv(sd, prefix: str) -> Dict[str, jnp.ndarray]:
    """WNConv1d params at `prefix` -> our conv pytree."""
    if f"{prefix}.v" in sd or _TORCH_KEY_ALIASES.get(f"{prefix}.v") in sd:
        v = _get(sd, f"{prefix}.v").transpose(2, 1, 0)
        g = _get(sd, f"{prefix}.g").reshape(-1)
        b = _get(sd, f"{prefix}.b")
        return {"v": jnp.asarray(v), "g": jnp.asarray(g), "b": jnp.asarray(b)}
    w = _get(sd, f"{prefix}.w").transpose(2, 1, 0)
    b = _get(sd, f"{prefix}.b")
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def _convT(sd, prefix: str) -> Dict[str, jnp.ndarray]:
    """WNConvTranspose1d params at `prefix` -> our conv pytree."""
    v = _get(sd, f"{prefix}.v").transpose(2, 0, 1)
    g = _get(sd, f"{prefix}.g").reshape(-1)
    b = _get(sd, f"{prefix}.b")
    return {"v": jnp.asarray(v), "g": jnp.asarray(g), "b": jnp.asarray(b)}


def _act(sd, prefix: str, cfg: CodecConfig):
    if cfg.activation not in ("snake", "snake_fast"):
        return None
    return {"alpha": jnp.asarray(_get(sd, f"{prefix}.alpha"))}


def _unit(sd, prefix: str, cfg: CodecConfig):
    return {
        "act1": _act(sd, f"{prefix}.act1", cfg),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "act2": _act(sd, f"{prefix}.act2", cfg),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }


def convert_torch_checkpoint(
    state_dict: Mapping[str, Any], cfg: CodecConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch state_dict (TorchCodec layout) -> (params, rvq_state)."""
    sd = state_dict

    encoder = {"stem": _conv(sd, "encoder.stem")}
    stages = []
    for i in range(len(cfg.strides)):
        p = f"encoder.stages.{i}"
        stages.append(
            {
                "units": [
                    _unit(sd, f"{p}.units.{j}", cfg)
                    for j in range(len(cfg.dilations))
                ],
                "down_act": _act(sd, f"{p}.down_act", cfg),
                "down": _conv(sd, f"{p}.down"),
            }
        )
    encoder["stages"] = stages
    encoder["final_act"] = _act(sd, "encoder.final_act", cfg)
    encoder["final"] = _conv(sd, "encoder.final")

    decoder = {"stem": _conv(sd, "decoder.stem")}
    dstages = []
    for i in range(len(cfg.strides)):
        p = f"decoder.stages.{i}"
        dstages.append(
            {
                "up_act": _act(sd, f"{p}.up_act", cfg),
                "up": _convT(sd, f"{p}.up"),
                "units": [
                    _unit(sd, f"{p}.units.{j}", cfg)
                    for j in range(len(cfg.dilations))
                ],
            }
        )
    decoder["stages"] = dstages
    decoder["final_act"] = _act(sd, "decoder.final_act", cfg)
    decoder["final"] = _conv(sd, "decoder.final")

    codebooks = jnp.asarray(_get(sd, "rvq.codebooks"), jnp.float32)
    rvq_state = {
        "codebooks": codebooks,
        # EMA stats are train-time state; a distributed inference checkpoint
        # carries only codebooks — seed stats consistently for fine-tuning.
        "ema_count": jnp.ones(codebooks.shape[:2], jnp.float32),
        "ema_sum": codebooks.copy(),
    }
    params = {"encoder": encoder, "decoder": decoder}
    if cfg.codebook_dim != cfg.latent_dim:
        # factorized codes: torch Linear weight is (out, in); ours is applied
        # as z @ W, so transpose — proj_in: (latent, codebook), proj_out:
        # (codebook, latent)
        params["proj_in"] = jnp.asarray(
            _get(sd, "proj_in.weight").T, jnp.float32
        )
        params["proj_out"] = jnp.asarray(
            _get(sd, "proj_out.weight").T, jnp.float32
        )
    return params, rvq_state


def load_torch_checkpoint_file(
    path: str, cfg: CodecConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a .pt/.pth file (torch CPU) and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return convert_torch_checkpoint(obj, cfg)
