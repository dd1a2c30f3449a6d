"""Model / training configuration variants.

Reference mechanism unknowable (SURVEY.md §0); contract requires named size /
bitrate variants incl. a "smallest bitrate/codebook config" (BASELINE.json:7).
"""

from nsc_tpu.configs.base import (  # noqa: F401
    CodecConfig,
    TrainConfig,
    get_config,
    list_configs,
    register_config,
)
