"""Pallas TPU kernels with jnp fallbacks.

Dispatch policy: the fused instance-norm kernel is OPT-IN
(``IR2RGB_ENABLE_PALLAS=1`` or ``set_kernels_enabled(True)``). Measured
on the v5e: standalone the kernel is within ~4% of XLA's fused
normalization, but in-context XLA fuses the norm chain into neighboring
pads/adds/converts while a pallas_call is a fusion barrier — enabling it
end-to-end cost 7.52 -> 10.41 ms/frame on the 512px pix2pixHD generator.
XLA's emitters win this pattern; the kernel stays as the demonstrably
correct custom-kernel path (interpret-mode tested, custom VJP) and the
production default is the XLA-fused reference implementation.
"""

from __future__ import annotations

import os

import jax

from .instance_norm import (
    instance_norm_act_pallas,
    instance_norm_act_reference,
)

_ENABLED = os.environ.get("IR2RGB_ENABLE_PALLAS", "0") == "1"


def set_kernels_enabled(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = enabled


def kernels_enabled() -> bool:
    return _ENABLED and jax.default_backend() == "tpu"


def fused_instance_norm_act(x, act: str = "relu", negative_slope: float = 0.2):
    """Instance norm + activation; Pallas-fused on TPU, jnp elsewhere."""
    if kernels_enabled():
        return instance_norm_act_pallas(x, act=act,
                                        negative_slope=negative_slope)
    return instance_norm_act_reference(x, act=act,
                                       negative_slope=negative_slope)


__all__ = [
    "fused_instance_norm_act",
    "instance_norm_act_pallas",
    "instance_norm_act_reference",
    "set_kernels_enabled",
    "kernels_enabled",
]
