"""Pallas TPU kernels with jnp fallbacks.

Dispatch policy: the fused kernels engage only on the TPU backend (and when
not disabled via ``set_kernels_enabled(False)`` /
``IR2RGB_DISABLE_PALLAS=1``); on CPU/interpret paths the jnp reference
implementations run instead — same numerics, XLA-fused.
"""

from __future__ import annotations

import os

import jax

from .instance_norm import (
    instance_norm_act_pallas,
    instance_norm_act_reference,
)

_ENABLED = os.environ.get("IR2RGB_DISABLE_PALLAS", "0") != "1"


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
