"""nsc_tpu — TPU-native neural speech codec framework.

A from-scratch JAX/XLA/Pallas rebuild of the cocosci/NSC neural speech codec
(reference mount absent this session — see SURVEY.md §0; built to the
capability contract in BASELINE.json:5):

  waveform -> strided 1D-conv encoder -> residual vector quantizer (RVQ)
           -> discrete codes -> mirrored decoder -> waveform

Public API (BASELINE.json:5 "public encode/decode/compress API"):
  load_model, encode, decode, compress, decompress

Everything on the compute path is pure-functional JAX: models are explicit
(init, apply) pairs over parameter pytrees, jit/shard_map/scan friendly, with
Pallas TPU kernels for the hot ops (RVQ distance-argmin, fused conv blocks,
framed STFT) behind flags with pure-XLA fallbacks.
"""

__version__ = "0.1.0"

_API_NAMES = (
    "compress",
    "decode",
    "decompress",
    "encode",
    "list_models",
    "load_model",
    "quantize_model",
    "streaming_compress",
    "streaming_decompress",
)


def __getattr__(name):
    # Lazy so `import nsc_tpu.utils.audio` doesn't pull in jax-heavy modules.
    if name in _API_NAMES:
        from nsc_tpu import api

        return getattr(api, name)
    raise AttributeError(f"module 'nsc_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_API_NAMES))
