from .metrics import flicker, psnr, ssim
from .stream import (
    StreamingGenerator,
    single_frame_infer,
    tensor2im,
    translate_clip,
)

__all__ = ["StreamingGenerator", "single_frame_infer", "translate_clip",
           "tensor2im", "psnr", "ssim", "flicker"]
