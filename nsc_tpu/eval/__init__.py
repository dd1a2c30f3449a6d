from nsc_tpu.eval.quality import (  # noqa: F401
    codebook_match_rate,
    mel_distance,
    pesq_proxy,
    si_snr,
)
from nsc_tpu.eval.sweep import bitrate_sweep  # noqa: F401
