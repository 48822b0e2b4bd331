"""Int8 quantized serving path (framework extension; no reference analog).

TPU v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate, and int8
activations halve the HBM bytes the conv pipeline moves. This module is
the single chokepoint every generator conv/matmul flows through
(``ops.py``, ``s2d_conv.py``, ``s2d_space.py`` call ``quant.conv`` /
``quant.dot`` instead of ``lax`` directly):

- mode "none" (default): bit-exact passthrough to
  ``lax.conv_general_dilated`` / ``lax.dot_general`` — the fp path is
  untouched.
- mode "int8": dynamic symmetric post-training quantization. Per call:
  activations per-tensor (scale = amax/127), weights per-output-channel,
  int8 conv with ``preferred_element_type=int32``, fp rescale. No
  zero-points, so padding/dilation zeros stay exact — the subpixel
  deconv and s2d lowerings quantize unchanged. Instance norm right after
  each conv renormalizes per channel, absorbing most of the ~1%/layer
  quantization error (measured end-to-end in ``tests/test_quant.py``).

SERVING ONLY: ``jnp.round`` has zero gradient, so the int8 mode would
silently starve training (no straight-through estimator is provided —
the reference trains fp32, we train bf16/fp32). ``cli/train.py`` refuses
to start when the mode is active.

Enable with ``--infer.quant int8`` (serving CLI / StreamingGenerator) or
``IR2RGB_QUANT=int8`` (benches); ``set_mode`` must be called before the
jitted functions trace — the mode is read at trace time, like the
``IR2RGB_IN_ELT`` lowering flag.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

_MODE = os.environ.get("IR2RGB_QUANT", "none") or "none"
_VALID = ("none", "int8")


def mode() -> str:
    return _MODE


def set_mode(m: str) -> None:
    """Switch the quantization mode. Must run BEFORE tracing the jitted
    step that should use it (trace-time flag)."""
    global _MODE
    m = m or "none"
    if m not in _VALID:
        raise ValueError(f"unknown quant mode {m!r} (none | int8)")
    _MODE = m


def _q8(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _act_scale(x):
    # per-tensor symmetric; fp32 amax (bf16 inputs upcast for the scale)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return jnp.maximum(amax, 1e-12) / 127.0


def conv(lhs, rhs, window_strides=(1, 1), padding="VALID", **kw):
    """Drop-in for ``lax.conv_general_dilated`` restricted to the
    NHWC/HWIO layout this framework uses everywhere. In int8 mode the
    ``precision``/``preferred_element_type`` hints are replaced by the
    int32 accumulate + fp rescale."""
    if _MODE == "none" or not jnp.issubdtype(lhs.dtype, jnp.floating):
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, **kw)
    dn = kw.get("dimension_numbers")
    spec = dn if isinstance(dn, tuple) else None
    assert spec is None or spec == ("NHWC", "HWIO", "NHWC"), spec
    out_dtype = lhs.dtype
    sx = _act_scale(lhs)
    rhs32 = rhs.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(rhs32), axis=(0, 1, 2)),
                     1e-12) / 127.0  # per output channel (HWIO axis 3)
    qkw = dict(kw)
    qkw.pop("precision", None)
    qkw["preferred_element_type"] = jnp.int32
    y = lax.conv_general_dilated(
        _q8(lhs.astype(jnp.float32), sx), _q8(rhs32, sw),
        window_strides, padding, **qkw)
    # NHWC output: per-channel rescale on the last axis
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def dot(lhs, rhs, dimension_numbers, **kw):
    """Drop-in for ``lax.dot_general`` for the s2d selection/wide-matmul
    sites: 1 contracting dim on each side, no batch dims, rhs 2-D with
    its free (output) dim last — per-output-column weight scales."""
    if _MODE == "none" or not jnp.issubdtype(lhs.dtype, jnp.floating):
        return lax.dot_general(lhs, rhs, dimension_numbers, **kw)
    (lc, rc), (lb, rb) = dimension_numbers
    assert not lb and not rb and len(rc) == 1 and rhs.ndim == 2, \
        "int8 dot supports the framework's matmul-tail pattern only"
    out_dtype = lhs.dtype
    sx = _act_scale(lhs)
    rhs32 = rhs.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(rhs32), axis=rc[0]),
                     1e-12) / 127.0  # per output column
    qkw = dict(kw)
    qkw.pop("precision", None)
    qkw["preferred_element_type"] = jnp.int32
    y = lax.dot_general(_q8(lhs.astype(jnp.float32), sx), _q8(rhs32, sw),
                        dimension_numbers, **qkw)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
