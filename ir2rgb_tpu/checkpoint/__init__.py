from .manager import CheckpointManager, restore_train_state, save_train_state
from .torch_import import (
    convert_vgg19_pth,
    import_discriminator,
    import_generator,
    load_state_dict,
)
from .torch_export import (
    export_discriminator,
    export_generator,
    save_torch_state_dict,
)

__all__ = [
    "CheckpointManager",
    "save_train_state",
    "restore_train_state",
    "import_generator",
    "import_discriminator",
    "load_state_dict",
    "convert_vgg19_pth",
    "export_generator",
    "export_discriminator",
    "save_torch_state_dict",
]
