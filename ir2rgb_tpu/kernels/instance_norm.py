"""Pallas TPU kernel: fused instance-norm + activation.

The single hottest non-conv pattern in the whole framework: every conv in
every generator/discriminator is followed by InstanceNorm + ReLU/LeakyReLU
(SURVEY.md §3.3; BASELINE.json:5 "Pallas-fused instance-norm+activation").
Left to XLA this is several HBM round-trips (reduce for mean, reduce for
var, then the normalize/activation elementwise chain); the kernel below does
one two-phase pass over HBM with on-chip fp32 accumulators:

  grid = (N, C/blkC, 2, H/blkH)    # row-major, last axis fastest
  phase 0: stream (blkH, W, blkC) tiles, accumulate sum / sum-of-squares
  phase 1: re-stream the same tiles, normalize + activation, write out

Stats are always fp32 (parity bar, SURVEY.md §7 hard-part #1); the output
keeps the input dtype (bf16 in the TPU compute path).

A ``jax.custom_vjp`` wraps the kernel so it is trainable: the backward pass
uses the saved fp32 (mean, rstd) and the standard instance-norm gradient,
expressed in jnp (XLA fuses it into the surrounding backward convs).

Layout note: NHWC with C on the lane (128) axis and W on the sublane axis —
C-blocks of 128 keep the VPU fully occupied for the usual 64..1024-channel
generator widths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ir2rgb_tpu.nn.ops import INSTANCE_NORM_EPS

_ACTS = ("none", "relu", "leaky_relu", "tanh")


def _apply_act(y, act: str, negative_slope: float):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "leaky_relu":
        return jnp.where(y >= 0.0, y, y * negative_slope)
    if act == "tanh":
        return jnp.tanh(y)
    return y


# ---------------------------------------------------------------------------
# Reference (jnp) implementation — used on CPU, for testing, and as the
# fallback for shapes the kernel does not cover.
# ---------------------------------------------------------------------------

def instance_norm_act_reference(x: jax.Array, act: str = "relu",
                                eps: float = INSTANCE_NORM_EPS,
                                negative_slope: float = 0.2) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return _apply_act(y, act, negative_slope).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, y_ref, mean_ref, rstd_ref, acc_ref, *,
            act: str, eps: float, negative_slope: float, hw: float,
            n_h_blocks: int):
    phase = pl.program_id(2)
    hi = pl.program_id(3)

    @pl.when(phase == 0)
    def _accumulate():
        @pl.when(hi == 0)
        def _init():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

        x32 = x_ref[0].astype(jnp.float32)           # (blkH, W, blkC)
        s = jnp.sum(x32, axis=(0, 1))                # (blkC,)
        sq = jnp.sum(x32 * x32, axis=(0, 1))
        acc_ref[0, :] += s
        acc_ref[1, :] += sq

        @pl.when(hi == n_h_blocks - 1)
        def _finalize():
            mean = acc_ref[0, :] / hw
            var = acc_ref[1, :] / hw - mean * mean
            rstd = lax.rsqrt(jnp.maximum(var, 0.0) + eps)
            acc_ref[2, :] = mean
            acc_ref[3, :] = rstd
            mean_ref[0, 0, :] = mean
            rstd_ref[0, 0, :] = rstd

    @pl.when(phase == 1)
    def _normalize():
        mean = acc_ref[2, :]
        rstd = acc_ref[3, :]
        x32 = x_ref[0].astype(jnp.float32)
        y = (x32 - mean[None, None, :]) * rstd[None, None, :]
        y = _apply_act(y, act, negative_slope)
        y_ref[0] = y.astype(y_ref.dtype)


def _pick_block_h(h: int, w: int, blk_c: int, itemsize: int) -> int:
    """Largest divisor-of-H tile keeping in+out blocks under ~6 MB VMEM."""
    budget = 6 * 1024 * 1024
    blk_h = h
    while blk_h > 1 and 2 * blk_h * w * blk_c * max(itemsize, 4) > budget:
        # prefer exact divisors; fall back to halving
        for d in range(blk_h // 2, 0, -1):
            if h % d == 0:
                blk_h = d
                break
        else:
            blk_h = max(1, blk_h // 2)
    return blk_h


@functools.partial(jax.jit,
                   static_argnames=("act", "eps", "negative_slope",
                                    "interpret"))
def _instance_norm_act_pallas(x: jax.Array, act: str, eps: float,
                              negative_slope: float,
                              interpret: bool = False):
    n, h, w, c = x.shape
    blk_c = 128 if c % 128 == 0 else c
    blk_h = _pick_block_h(h, w, blk_c, x.dtype.itemsize)
    n_h_blocks = h // blk_h
    grid = (n, c // blk_c, 2, n_h_blocks)

    y, mean, rstd = pl.pallas_call(
        functools.partial(_kernel, act=act, eps=eps,
                          negative_slope=negative_slope, hw=float(h * w),
                          n_h_blocks=n_h_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_h, w, blk_c),
                         lambda ni, ci, p, hi: (ni, hi, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_h, w, blk_c),
                         lambda ni, ci, p, hi: (ni, hi, 0, ci),
                         memory_space=pltpu.VMEM),
            # stats as (n, 1, c): block (1, 1, blk_c) keeps the last two
            # dims tiling-legal for any channel count
            pl.BlockSpec((1, 1, blk_c), lambda ni, ci, p, hi: (ni, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_c), lambda ni, ci, p, hi: (ni, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4, blk_c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(x)
    return y, mean[:, 0, :], rstd[:, 0, :]


def _supported(x: jax.Array) -> bool:
    if x.ndim != 4:
        return False
    n, h, w, c = x.shape
    # C must fill the 128-wide lane dimension: narrower channel counts
    # waste the VPU and measurably lose to XLA's fused normalization
    # (observed: enabling the kernel on the C=32/64 high-resolution layers
    # dropped end-to-end fps ~2x), so those fall back to XLA.
    if c % 128 != 0:
        return False
    # sublane alignment: W multiple of 8 for f32 tiles
    return w % 8 == 0 and h >= 1


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused(x, act, eps, negative_slope):
    y, _, _ = _instance_norm_act_pallas(x, act, eps, negative_slope)
    return y


def _fused_fwd(x, act, eps, negative_slope):
    y, mean, rstd = _instance_norm_act_pallas(x, act, eps, negative_slope)
    return y, (x, mean, rstd)


def _fused_bwd(act, eps, negative_slope, res, g):
    x, mean, rstd = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = mean[:, None, None, :]
    rstd = rstd[:, None, None, :]
    xhat = (x32 - mean) * rstd
    # fold activation gradient
    if act == "relu":
        g32 = g32 * (xhat > 0)
    elif act == "leaky_relu":
        g32 = jnp.where(xhat >= 0, g32, g32 * negative_slope)
    elif act == "tanh":
        t = jnp.tanh(xhat)
        g32 = g32 * (1.0 - t * t)
    gm = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gx = jnp.mean(g32 * xhat, axis=(1, 2), keepdims=True)
    dx = rstd * (g32 - gm - xhat * gx)
    return (dx.astype(x.dtype),)


_fused.defvjp(_fused_fwd, _fused_bwd)


def instance_norm_act_pallas(x: jax.Array, act: str = "relu",
                             eps: float = INSTANCE_NORM_EPS,
                             negative_slope: float = 0.2,
                             interpret: bool = False) -> jax.Array:
    """Fused instance-norm + activation via the Pallas TPU kernel.

    Falls back to the jnp reference for unsupported shapes.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    testing path; forward only, no custom VJP).
    """
    assert act in _ACTS, act
    if not _supported(x):
        return instance_norm_act_reference(x, act, eps, negative_slope)
    if interpret:
        y, _, _ = _instance_norm_act_pallas(x, act, eps, negative_slope,
                                            interpret=True)
        return y
    return _fused(x, act, eps, negative_slope)
