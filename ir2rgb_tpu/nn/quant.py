"""Int8 quantized serving path (framework extension; no reference analog).

TPU v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate, and int8
activations halve the HBM bytes the conv pipeline moves. This module is
the single chokepoint every generator conv/matmul flows through
(``ops.py``, ``s2d_conv.py``, ``s2d_space.py`` call ``quant.conv`` /
``quant.dot`` instead of ``lax`` directly). Modes:

- "none" (default): bit-exact passthrough to
  ``lax.conv_general_dilated`` / ``lax.dot_general`` — the fp path is
  untouched.
- "int8": dynamic symmetric post-training quantization. Per call:
  activations per-tensor (scale = amax/127), weights per-output-channel,
  int8 conv with ``preferred_element_type=int32``, fp rescale. No
  zero-points, so padding/dilation zeros stay exact — the subpixel
  deconv and s2d lowerings quantize unchanged. Instance norm right after
  each conv renormalizes per channel, absorbing most of the ~1%/layer
  quantization error (measured end-to-end in ``tests/test_quant.py``).
- "int8_mixed": per-layer mixed precision (round-4 verdict item 7 —
  "head/tail + first trunk convs fp, interior trunk w8a8"). A conv
  quantizes w8a8 ONLY when both its input and output channel counts are
  >= ``MIXED_MIN_CH`` (default 32; override ``IR2RGB_QUANT_MIXED_MIN``
  for experiments); narrower convs pass through in fp. That one width
  gate is exactly the sensitivity boundary: the c7s1 head (cin=3), the
  output conv (cout=3), and the enhancer down0 (cin=3) stay fp — and
  because the s2d reps fold space into channels at 3*s^2 = 48 < 64, the
  s2d tail folds stay fp too at thresholds >= 64 — while the interior
  trunk, where the HBM traffic lives, quantizes. THE mode with a
  measured win: +9-12% fps at the HBM-bound tiers (2048p 34.1 vs 30.8
  bf16; 1024p 86.7 vs 79.5; 512p b8 462.7 vs 414.3) where full "int8"
  LOSES or barely gains — the narrow-layer quantize chains were pure
  overhead. Quality/perf record: docs/DESIGN.md §6b.
- "int8_w": weight-only quantization — per-output-channel int8 weights
  dequantized back to the activation dtype before a normal fp conv.
  Activations never quantize, so there is no per-frame amax reduction
  serializing with the conv chain and quality is far higher than w8a8
  (the error is a static per-channel weight perturbation). NOTE on perf:
  the quantize→dequantize chain depends only on the (loop-invariant)
  params, so inside a serving scan XLA hoists it out of the loop and the
  steady-state program is EXACTLY the fp program on perturbed weights —
  this mode documents weight-only *quality*, not a traffic win. A real
  weight-traffic win would need the conv to consume int8 weights
  directly against bf16 activations, which the MXU does not do (XLA
  inserts a convert, materializing the bf16 weights again). Measured
  numbers in docs/DESIGN.md §6b.

HOW THE MODE IS SET (round 4 — no process-global): the mode is a
trace-time *context*, not a module global. ``GanModel.generate`` (and
the cycle model's) wraps its body in ``using(resolve(cfg.infer.quant))``
— each model instance carries its own mode from its own config, so one
process can serve an int8 artifact and a bf16 model side by side
(tested: ``tests/test_quant.py::test_side_by_side_modes``), and there is
no set-after-trace footgun: the mode is established by the model at its
own trace time. ``IR2RGB_QUANT`` remains an *experiment override* that
wins over every config (like the other ``IR2RGB_*`` lowering knobs).

SERVING ONLY: ``jnp.round`` has zero gradient, so the int8 mode would
silently starve training (no straight-through estimator is provided —
the reference trains fp32, we train bf16/fp32). ``generate(train=True)``
always traces in mode "none", and ``cli/train.py`` refuses to start
when a quant mode is configured at all.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import jax.numpy as jnp
from jax import lax

_VALID = ("none", "int8", "int8_w", "int8_mixed")

# int8_mixed: a conv/dot quantizes only when both its channel-ish dims
# reach this width (see module docstring); env override is an
# experiment knob like the IR2RGB_* lowering flags. Default 32 from the
# round-5 sweep: on the local-enhancer nets quality is FLAT across
# 32/64/128 (30.28 dB each on ngf32-local at He weights — the error
# lives in the >=128ch deep trunk) while 2048p fps is best at 32
# (34.07 vs 33.2 at 64/128: the 32->64 full-res enhancer convs are
# giant HBM movers worth quantizing). Raise to 128 for global-only
# nets where it buys ~3 dB (35.28 vs 31.97) at ~the same speed.
MIXED_MIN_CH = int(os.environ.get("IR2RGB_QUANT_MIXED_MIN", "32"))

# experiment override (read once at import, like the IR2RGB_* lowering
# flags): when set it wins over every model's cfg.infer.quant
_ENV_OVERRIDE = os.environ.get("IR2RGB_QUANT", "") or ""

_MODE_VAR: contextvars.ContextVar = contextvars.ContextVar(
    "ir2rgb_quant_mode", default="none")


def _validate(m: str) -> str:
    m = m or "none"
    if m not in _VALID:
        raise ValueError(
            f"unknown quant mode {m!r} (none | int8 | int8_w)")
    return m


def mode() -> str:
    """The mode in effect for ops traced right now."""
    return _MODE_VAR.get()


def env_override() -> str:
    """The IR2RGB_QUANT experiment override ('' when unset)."""
    if _ENV_OVERRIDE:
        _validate(_ENV_OVERRIDE)
    return _ENV_OVERRIDE


def resolve(cfg_mode: str) -> str:
    """Effective mode for a model: the IR2RGB_QUANT experiment override
    if set, else the model's own config value."""
    return _validate(_ENV_OVERRIDE or cfg_mode)


@contextlib.contextmanager
def using(m: str):
    """Trace-time scope: ops built inside run in mode ``m``. The model
    layer wraps its serving forward in this, so the mode travels with
    the model instance, not the process."""
    token = _MODE_VAR.set(_validate(m))
    try:
        yield
    finally:
        _MODE_VAR.reset(token)


def _q8(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _act_scale(x):
    # per-tensor symmetric; fp32 amax (bf16 inputs upcast for the scale)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return jnp.maximum(amax, 1e-12) / 127.0


def _w_q8_per_channel(rhs32, axes, scale_shape):
    """Per-output-channel symmetric int8 weights + their scales."""
    sw = jnp.maximum(jnp.max(jnp.abs(rhs32), axis=axes), 1e-12) / 127.0
    return _q8(rhs32, sw.reshape(scale_shape)), sw


def conv(lhs, rhs, window_strides=(1, 1), padding="VALID", **kw):
    """Drop-in for ``lax.conv_general_dilated`` restricted to the
    NHWC/HWIO layout this framework uses everywhere. In int8 mode the
    ``precision``/``preferred_element_type`` hints are replaced by the
    int32 accumulate + fp rescale."""
    m = _MODE_VAR.get()
    if m == "int8_mixed":
        # HWIO: gate on the real channel widths of this layer
        m = ("int8" if min(rhs.shape[2], rhs.shape[3]) >= MIXED_MIN_CH
             else "none")
    if m == "none" or not jnp.issubdtype(lhs.dtype, jnp.floating):
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, **kw)
    dn = kw.get("dimension_numbers")
    spec = dn if isinstance(dn, tuple) else None
    assert spec is None or spec == ("NHWC", "HWIO", "NHWC"), spec
    out_dtype = lhs.dtype
    rhs32 = rhs.astype(jnp.float32)
    # per output channel (HWIO axis 3)
    qw, sw = _w_q8_per_channel(rhs32, (0, 1, 2), (1, 1, 1, -1))
    if m == "int8_w":
        # weight-only: dequantized weights, fp conv, untouched activations
        deq = (qw.astype(jnp.float32)
               * sw.reshape(1, 1, 1, -1)).astype(out_dtype)
        return lax.conv_general_dilated(
            lhs, deq, window_strides, padding, **kw)
    sx = _act_scale(lhs)
    qkw = dict(kw)
    qkw.pop("precision", None)
    qkw["preferred_element_type"] = jnp.int32
    y = lax.conv_general_dilated(
        _q8(lhs.astype(jnp.float32), sx), qw,
        window_strides, padding, **qkw)
    # NHWC output: per-channel rescale on the last axis
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def dot(lhs, rhs, dimension_numbers, mixed_ch=None, **kw):
    """Drop-in for ``lax.dot_general`` for the s2d selection/wide-matmul
    sites: 1 contracting dim on each side, no batch dims, rhs 2-D with
    its free (output) dim last — per-output-column weight scales.
    ``mixed_ch=(ci, co)`` is the UNDERLYING conv's channel widths (the
    s2d folds inflate the matmul dims, so the int8_mixed gate can't read
    them off ``rhs.shape``); sites that don't pass it stay fp in mixed
    mode."""
    m = _MODE_VAR.get()
    if m == "int8_mixed":
        m = ("int8" if mixed_ch and min(mixed_ch) >= MIXED_MIN_CH
             else "none")
    if m == "none" or not jnp.issubdtype(lhs.dtype, jnp.floating):
        return lax.dot_general(lhs, rhs, dimension_numbers, **kw)
    (lc, rc), (lb, rb) = dimension_numbers
    assert not lb and not rb and len(rc) == 1 and rhs.ndim == 2, \
        "int8 dot supports the framework's matmul-tail pattern only"
    out_dtype = lhs.dtype
    rhs32 = rhs.astype(jnp.float32)
    qw, sw = _w_q8_per_channel(rhs32, rc[0], (1, -1) if rc[0] == 0
                               else (-1, 1))
    if m == "int8_w":
        deq = (qw.astype(jnp.float32)
               * sw.reshape((1, -1) if rc[0] == 0 else (-1, 1))
               ).astype(out_dtype)
        return lax.dot_general(lhs, deq, dimension_numbers, **kw)
    sx = _act_scale(lhs)
    qkw = dict(kw)
    qkw.pop("precision", None)
    qkw["preferred_element_type"] = jnp.int32
    y = lax.dot_general(_q8(lhs.astype(jnp.float32), sx), qw,
                        dimension_numbers, **qkw)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
