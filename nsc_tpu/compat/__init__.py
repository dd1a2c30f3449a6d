from nsc_tpu.compat.torch_compat import (  # noqa: F401
    convert_torch_checkpoint,
    load_torch_checkpoint_file,
)
