from .gan import gan_loss_d, gan_loss_g, gradient_penalty
from .reconstruction import feature_matching_loss, l1_loss, vgg_loss

__all__ = [
    "gan_loss_g",
    "gan_loss_d",
    "gradient_penalty",
    "l1_loss",
    "feature_matching_loss",
    "vgg_loss",
]
