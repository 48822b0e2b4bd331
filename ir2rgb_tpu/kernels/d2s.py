"""Pallas depth-to-space (2x) kernel — EXPERIMENTAL, opt-in only.

The generators' final op converts the s2d-phase tensor (N, H/2, W/2, 4*C)
into the output image (N, H, W, C). XLA lowers the reshape-transpose-
reshape as a materialized relayout whose minor dims are tiny (the 2-wide
phase dims and the 3-wide channel land on the 128-lane axis), measured at
~244 us/frame at 512px for 1.5 MB of bf16 traffic (~13 GB/s) — the
single largest non-conv op left in the round-2 profile (docs/DESIGN.md).

This kernel tried to do the interleave with full 128-lane rows (planar
phase view in, planar image out, both boundary transposes pure bitcasts
against XLA's natural layouts, so no upstream retiling can propagate —
the failure mode that killed the fused-tail kernel). **Outcome: the
current Mosaic compiler cannot lower ANY lane-merging register shuffle**
(all measured on the v5e, errors verbatim):

- bf16 ``stack(axis=-1).reshape``: "Insertion of minor dim that is not a
  no-op only supported for 32-bit types";
- the f32 variant of the same: "infer-vector-layout: unsupported shape
  cast" for ``vector<256x256x2xf32> -> vector<256x512xf32>``;
- sublane merges fail identically, and strided refs can't express the
  2x2 scatter in a BlockSpec.

The PRODUCTION fix is pure XLA instead: ``s2d_conv._d2s_dot`` computes
the interleave as four 0/1 selection matmuls on the otherwise-idle MXU
(exact; measured 264 -> 282 fps on the local 512 config, 191.5 -> 201
on the global — the relayout chain disappears entirely). This module
stays as the interpret-tested record of the Mosaic limitation; reachable
only via IR2RGB_D2S=pallas, which will fail to compile on current
Mosaic. Exactness is tested in interpret mode in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def d2s_reference(y: jax.Array, co: int) -> jax.Array:
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, co)


def _d2s_kernel(co: int, y_ref, o_ref):
    # y_ref: (4*co, hs, ws) planar phases, channel index = (dh*2 + dw)*co + c
    # o_ref: (co, hs, 2, 2*ws) — whose row-major bytes ARE the (co, 2hs,
    #   2ws) image planes (the caller's merge of the (hs, 2) dims is a
    #   free row-major reshape), so the sublane interleave never happens
    #   in-register — each image-row parity is its own store.
    # The lane interleave runs in f32 (Mosaic supports minor-dim
    # reshapes only for 32-bit element types); HBM<->VMEM traffic stays
    # in the input dtype.
    hs, ws = y_ref.shape[1], y_ref.shape[2]
    for c in range(co):
        p00 = y_ref[0 * co + c].astype(jnp.float32)
        p01 = y_ref[1 * co + c].astype(jnp.float32)
        p10 = y_ref[2 * co + c].astype(jnp.float32)
        p11 = y_ref[3 * co + c].astype(jnp.float32)
        # lane interleave: (hs, ws, 2) -> (hs, 2*ws)
        even = jnp.stack([p00, p01], axis=-1).reshape(hs, 2 * ws)
        odd = jnp.stack([p10, p11], axis=-1).reshape(hs, 2 * ws)
        o_ref[c, :, 0, :] = even.astype(o_ref.dtype)
        o_ref[c, :, 1, :] = odd.astype(o_ref.dtype)


def _s2d_kernel(co: int, x_ref, o_ref):
    # x_ref: (co, hs, 2, 2*ws) — the image planes with rows pre-split by
    #   parity (a free row-major reshape outside the kernel)
    # o_ref: (4*co, hs, ws) phase planes, channel index = (dh*2 + dw)*co + c
    hs, w2 = x_ref.shape[1], x_ref.shape[3]
    ws = w2 // 2
    for c in range(co):
        for dh in (0, 1):
            # f32 for the minor-dim-splitting reshape (see _d2s_kernel)
            row = x_ref[c, :, dh, :].astype(jnp.float32)
            lanes = row.reshape(hs, ws, 2)
            o_ref[(dh * 2 + 0) * co + c] = lanes[:, :, 0].astype(o_ref.dtype)
            o_ref[(dh * 2 + 1) * co + c] = lanes[:, :, 1].astype(o_ref.dtype)


def s2d_reference(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s_supported(shape, co: int) -> bool:
    n, hs, ws, c4 = shape
    return (n == 1 and c4 == 4 * co and co <= 8
            and ws % 128 == 0 and hs % 8 == 0
            # VMEM: in + out planes must fit (~4 bytes/px at bf16)
            and c4 * hs * ws * 2 * 2 <= 12 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def d2s_pallas(y: jax.Array, co: int, interpret: bool = False) -> jax.Array:
    """(1, hs, ws, 4*co) -> (1, 2*hs, 2*ws, co) via the planar kernel.

    Differentiable: the VJP is the exact inverse permutation, computed by
    the mirrored s2d kernel (same planar full-lane trick)."""
    n, hs, ws, c4 = y.shape
    yp = jnp.transpose(y, (0, 3, 1, 2)).reshape(c4, hs, ws)
    out = pl.pallas_call(
        functools.partial(_d2s_kernel, co),
        out_shape=jax.ShapeDtypeStruct((co, hs, 2, 2 * ws), y.dtype),
        interpret=interpret,
    )(yp)
    return jnp.transpose(out.reshape(1, co, 2 * hs, 2 * ws), (0, 2, 3, 1))


def s2d_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """(1, H, W, co) -> (1, H/2, W/2, 4*co): the inverse planar kernel."""
    n, h, w, co = x.shape
    xp = jnp.transpose(x, (0, 3, 1, 2)).reshape(co, h // 2, 2, w)
    out = pl.pallas_call(
        functools.partial(_s2d_kernel, co),
        out_shape=jax.ShapeDtypeStruct((4 * co, h // 2, w // 2), x.dtype),
        interpret=interpret,
    )(xp)
    return jnp.transpose(out.reshape(1, 4 * co, h // 2, w // 2),
                         (0, 2, 3, 1))


def _d2s_fwd(y, co, interpret):
    return d2s_pallas(y, co, interpret), None


def _d2s_bwd(co, interpret, _, g):
    return (s2d_pallas(g, interpret),)


d2s_pallas.defvjp(_d2s_fwd, _d2s_bwd)
