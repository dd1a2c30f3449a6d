from nsc_tpu.losses.spectral import (  # noqa: F401
    MultiResSTFTConfig,
    mel_loss,
    multi_res_stft_loss,
    time_l1_loss,
)
from nsc_tpu.losses.gan import (  # noqa: F401
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)
