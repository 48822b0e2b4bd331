from . import ops
from .generators import (
    GenConfig,
    define_g,
    global_generator_apply,
    global_generator_init,
    local_enhancer_apply,
    local_enhancer_init,
    resnet_generator_apply,
    resnet_generator_init,
    unet_generator_apply,
    unet_generator_init,
)
from .discriminators import (
    DiscConfig,
    define_d,
    multiscale_disc_apply,
    multiscale_disc_init,
    n_layer_disc_apply,
    n_layer_disc_init,
)
from .encoders import (
    EncoderConfig,
    define_e,
    encoder_apply,
    encoder_init,
    instance_wise_avg_pool,
)
from .vgg import Vgg19Params, vgg19_features, vgg19_init

__all__ = [
    "ops",
    "GenConfig", "define_g",
    "resnet_generator_init", "resnet_generator_apply",
    "unet_generator_init", "unet_generator_apply",
    "global_generator_init", "global_generator_apply",
    "local_enhancer_init", "local_enhancer_apply",
    "DiscConfig", "define_d",
    "n_layer_disc_init", "n_layer_disc_apply",
    "multiscale_disc_init", "multiscale_disc_apply",
    "EncoderConfig", "define_e", "encoder_init", "encoder_apply",
    "instance_wise_avg_pool",
    "Vgg19Params", "vgg19_init", "vgg19_features",
]
