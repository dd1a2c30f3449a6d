from nsc_tpu.models.codec import (  # noqa: F401
    NeuralSpeechCodec,
    init_codec,
)
