from .config import (
    PRESETS,
    Config,
    DataConfig,
    InferConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
    config_from_args,
    load_config,
    parse_cli,
    save_config,
)
from .compat import REFERENCE_FLAG_TABLE, from_reference_flags

__all__ = [
    "Config",
    "ModelConfig",
    "DataConfig",
    "LossConfig",
    "TrainConfig",
    "InferConfig",
    "parse_cli",
    "config_from_args",
    "save_config",
    "load_config",
    "REFERENCE_FLAG_TABLE",
    "from_reference_flags",
    "PRESETS",
]
