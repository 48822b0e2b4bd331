"""Space-to-depth convolution lowering.

The family's generators spend most of their FLOP budget at full resolution
with few channels (c7s1 head/tail with 3 channels, 32..64-channel enhancer
blocks). XLA's TPU conv for such shapes runs at ~1-8% MXU utilization: the
contraction (K = kh*kw*cin) and output (N = cout) dims are far below the
128-lane tile, so the systolic array idles (measured: the two 7x7 C=3
convs at 512^2 cost 3.5 ms of a 7.5 ms frame).

The lowering here computes the SAME convolution in 2x2 space-to-depth
space: x (H, W, C) -> xs (H/2, W/2, 4C); the k x k kernel splits into
per-(output-phase, input-phase) sub-kernels gathered into one dense
(kk, kk, 4C, 4*cout) kernel; the conv output depth-to-spaces back to
(H_out, W_out, cout). M shrinks 4x, K and N grow 4x — MXU-shaped. The
transformation is exact (verified element-wise against the direct conv).

Derivation (1D, per output phase d and input phase q): with xpad = x
padded by p, out[2i+d] = sum_r w[r] xpad[2i+d+r]; the tap index u=2i+d+r
has phase q=(d+r)%2 and s2d position i+(d+r-q)/2, so sub-kernel
W[d,q][o] = w[r] at offset o=(d+r-q)/2. Stride-2 convs keep only output
phase 0 and need no depth-to-space.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ir2rgb_tpu.nn import quant


@functools.lru_cache(maxsize=None)
def _plan(k: int, pad: int, stride: int) -> Tuple:
    """Static plan: ((d,q) -> [(offset, r)]), window [omin, omax]."""
    out_phases = (0, 1) if stride == 1 else (0,)
    entries = {}
    offs = []
    for d in out_phases:
        for q in (0, 1):
            taps = []
            # phase of tap u = (d + r) % 2 relative to xpad's own grid
            for r in range(k):
                if (d + r) % 2 == q:
                    o = (d + r - q) // 2
                    taps.append((o, r))
                    offs.append(o)
            entries[(d, q)] = taps
    omin, omax = min(offs), max(offs)
    return entries, omin, omax, out_phases


@functools.lru_cache(maxsize=None)
def _gather_maps(k: int, pad: int, stride: int):
    """Static index maps for one-gather kernel rearrangement:
    (kk,kk,4,P) arrays of source (row, col) into w, plus validity mask."""
    entries, omin, omax, out_phases = _plan(k, pad, stride)
    kk = omax - omin + 1
    np_ = len(out_phases)
    P = np_ * np_
    A = np.zeros((kk, kk, 4, P), np.int32)
    B = np.zeros((kk, kk, 4, P), np.int32)
    M = np.zeros((kk, kk, 4, P), bool)
    for dh in out_phases:
        for dw in out_phases:
            pout = (dh * np_ + dw) if stride == 1 else 0
            for qh in (0, 1):
                for qw in (0, 1):
                    qidx = qh * 2 + qw
                    for oa, ra in entries[(dh, qh)]:
                        for ob, rb in entries[(dw, qw)]:
                            A[oa - omin, ob - omin, qidx, pout] = ra
                            B[oa - omin, ob - omin, qidx, pout] = rb
                            M[oa - omin, ob - omin, qidx, pout] = True
    return A, B, M, kk, omin, P


def _rearrange_kernel(w: jax.Array, k: int, pad: int, stride: int):
    """(k,k,ci,co) -> (kk,kk,4ci,P*co) dense kernel for the s2d conv, via a
    single gather (P = 4 output phases for stride 1, 1 for stride 2)."""
    ci, co = w.shape[2], w.shape[3]
    A, B, M, kk, omin, P = _gather_maps(k, pad, stride)
    # gather: (kk,kk,4,P,ci,co)
    wk = w[jnp.asarray(A), jnp.asarray(B)]
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    # -> (kk, kk, 4*ci, P*co)
    wk = wk.transpose(0, 1, 2, 4, 3, 5).reshape(kk, kk, 4 * ci, P * co)
    return wk, kk, omin


def space_to_depth(x: jax.Array, f: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    # channel layout (qh, qw, c) to match _rearrange_kernel's qidx
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f,
                                                 f * f * c)


@functools.lru_cache(maxsize=None)
def _d2s_conv_kernel(c4: int, co: int, dtype_name: str) -> np.ndarray:
    """2x2 selection kernel: conv with lhs_dilation=2 computes the
    depth-to-space interleave on the conv datapath (one valid tap per
    output pixel selects the right phase channel)."""
    w = np.zeros((2, 2, c4, co), np.dtype(dtype_name))
    for dh in (0, 1):
        for dw in (0, 1):
            for c in range(co):
                w[1 - dh, 1 - dw, (dh * 2 + dw) * co + c, c] = 1
    return w


def _d2s_conv(y: jax.Array, co: int) -> jax.Array:
    w = jnp.asarray(_d2s_conv_kernel(y.shape[3], co, y.dtype.name))
    return quant.conv(
        y, w, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _interleave_mats(n: int, dtype_name: str):
    """(E0, E1): (n, 2n) selection matrices, E0[j, 2j] = E1[j, 2j+1] = 1.
    a @ E0 + b @ E1 interleaves a and b element-wise along that axis."""
    e0 = np.zeros((n, 2 * n), np.dtype(dtype_name))
    e1 = np.zeros((n, 2 * n), np.dtype(dtype_name))
    idx = np.arange(n)
    e0[idx, 2 * idx] = 1
    e1[idx, 2 * idx + 1] = 1
    return e0, e1


def _d2s_dot(y: jax.Array, co: int) -> jax.Array:
    """Depth-to-space as four selection matmuls on the (otherwise idle)
    MXU — ~2.4 GFLOPs of multiply-by-one at 512px instead of the ~244 us
    relayout copy chain the transpose lowering costs (minor dims of 2/3
    land on the 128-lane axis at ~13 GB/s). Exact: every output element
    is 1*x + 0 + ... in the MXU's fp32 accumulator."""
    n, hs, ws, c4 = y.shape
    e0w, e1w = (jnp.asarray(m) for m in _interleave_mats(ws, y.dtype.name))
    e0h, e1h = (jnp.asarray(m) for m in _interleave_mats(hs, y.dtype.name))
    p = [y[..., q * co:(q + 1) * co] for q in range(4)]
    # HIGHEST keeps f32 inputs exact (XLA's default decomposes f32 dots
    # into bf16 passes, truncating the mantissa even for 0/1 weights)
    prec = (lax.Precision.DEFAULT if y.dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)
    ein = functools.partial(jnp.einsum, precision=prec)
    # lane (W) interleave: nhwc,wW->nhWc
    even = (ein("nhwc,wW->nhWc", p[0], e0w)
            + ein("nhwc,wW->nhWc", p[1], e1w))
    odd = (ein("nhwc,wW->nhWc", p[2], e0w)
           + ein("nhwc,wW->nhWc", p[3], e1w))
    # row (H) interleave: nhWc,hH->nHWc
    out = (ein("nhWc,hH->nHWc", even, e0h)
           + ein("nhWc,hH->nHWc", odd, e1h))
    return out.astype(y.dtype)


def depth_to_space(y: jax.Array, co: int, f: int = 2) -> jax.Array:
    # NOTE(round 2): a channel-split + stack lowering (whose final
    # reshape is a row-major identity) was measured in-context and is
    # NOT faster — XLA canonicalizes both forms to the same copy
    # (242.7 -> 240.0 fps at 512px). The 6-d transpose is the XLA
    # default; on TPU the Pallas planar-interleave kernel
    # (kernels/d2s.py) replaces the ~244 us relayout chain when the
    # shape qualifies. IR2RGB_D2S=xla|conv|pallas overrides.
    if f == 2 and jax.default_backend() == "tpu":
        import os
        mode = os.environ.get("IR2RGB_D2S", "dot")
        if mode == "dot" and co <= 8:
            return _d2s_dot(y, co)
        if mode == "pallas":
            from ir2rgb_tpu.kernels.d2s import d2s_pallas, d2s_supported
            if d2s_supported(y.shape, co):
                return d2s_pallas(y, co)
        if mode == "conv":
            return _d2s_conv(y, co)
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, f, f, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * f, w * f, co)


def conv_s2d(x: jax.Array, w: jax.Array, stride: int, pad: int
             ) -> jax.Array:
    """Exact conv via 2x2 space-to-depth. x NHWC, w (k,k,ci,co), symmetric
    integer padding. Requires even H, W (the generators' resolutions are
    powers of two)."""
    n, h, wd, ci = x.shape
    k, co = w.shape[0], w.shape[3]
    h_out = (h + 2 * pad - k) // stride + 1
    w_out = (wd + 2 * pad - k) // stride + 1
    wk, kk, omin = _rearrange_kernel(w, k, pad, stride)

    # xpad phases live on xpad's grid: prepad with p, then s2d. Odd
    # padded size: extend with zeros to even PER DIM (extra taps hit
    # zeros or are trimmed below).
    xp = x
    if pad:
        xp = jnp.pad(xp, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, xp.shape[1] % 2),
                      (0, xp.shape[2] % 2), (0, 0)))
    xs = space_to_depth(xp)

    # s2d-space output length: stride 1 -> ceil(out/2) positions per
    # phase; stride 2 -> out positions (phase 0 only) — per spatial dim
    # (non-square inputs have different H/W extents)
    jh = (h_out + 1) // 2 if stride == 1 else h_out
    jw = (w_out + 1) // 2 if stride == 1 else w_out
    # conv over xs: position j uses taps j+o for o in [omin, omax]
    lo = -omin
    hi_h = max((jh - 1) + (kk - 1 + omin) - (xs.shape[1] - 1), 0)
    hi_w = max((jw - 1) + (kk - 1 + omin) - (xs.shape[2] - 1), 0)
    y = quant.conv(
        xs, wk, window_strides=(1, 1),
        padding=[(lo, hi_h), (lo, hi_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )
    y = y[:, :jh, :jw, :]
    if stride == 1:
        y = depth_to_space(y, co)
        y = y[:, :h_out, :w_out, :]
    return y
