"""Fused generator tail: reflect-pad + 7x7 conv + bias + tanh + d2s.

The c7s1-3 output stage is the most layout-hostile region of the 512px
generators (round-1 profile, docs/DESIGN.md §4): on the persistent-s2d
path XLA spends ~750 us/frame there — a materialized 259x259x128
reflect-pad (+fused relu) at 322 us, the 128->12-channel conv at 182 us,
and a 250 us depth-to-space (reshape+copy at ~6 GB/s) for the final
(512,512,3) image — ~18% of the 4.35 ms frame on work whose arithmetic
is ~2.5 GFLOPs and whose traffic is ~18 MB.

This kernel does the whole region in ONE pallas_call over row tiles of
the UNPADDED s2d activation:

- reflect padding is index algebra. Reflection distances are even, so a
  reflected image row/col always lands in the SAME phase block — each
  halo row/col is a channel-split concat of two interior rows/cols,
  built in-register; nothing is materialized;
- the 7x7 image conv becomes 25 (tile*W, 4C) x (4C, 12) MXU matmuls via
  the phase-expanded weight (s2d_space._conv_maps, k=7, pad=3);
- bias + tanh run on the fp32 accumulator;
- the phase channels are interleaved straight into the output rows, so
  the (1, H, W, 3) image is written directly and no depth-to-space HLO
  ever exists.

MEASURED OUTCOME (v5e, 2026-08-16, round 2): standalone this kernel wins
decisively — the tail region goes 1039 -> 550 us/iter (same feedback
loop, exact to bf16 tolerance on device). IN CONTEXT it loses: the
pallas custom call pins its operand to the default layout, and XLA's
layout assignment propagates that constraint backward through the whole
producer graph instead of inserting one local copy — every upstream
conv gets retiled (profile: conv time 1.83 -> 4.56 ms/frame, activation
tiles degrade from T(8,128) to T(2,128) with the size-1 batch dim forced
into sublanes), regressing the full 512px generator 4.33 -> 7.0 ms.
Attempts that did NOT stop the propagation (all measured at ~7 ms):
`jax.experimental.layout.with_layout_constraint` at the boundary,
`lax.optimization_barrier`, rank-4 vs rank-3 operands, and a rank-2
row-major view (which then fails Mosaic's 8-row DMA alignment on the
tiled dim). Production default is therefore the XLA composition
(kernels stay opt-in: IR2RGB_ENABLE_TAIL_KERNEL=1), and this file is
kept as the measured evidence + the recipe should a future JAX expose
operand-layout control for pallas_call.

Forward/inference only (the serving hot path); training keeps the XLA
path. Exactness is tested against the image-space reference in
interpret mode and on-device (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _tail_maps():
    """Phase-expanded gather maps for k=7, pad=3, stride=1, s2d out:
    taps at s2d offsets -2..+2 (kk=5)."""
    from ir2rgb_tpu.nn.s2d_space import _conv_maps
    A, B, M, kk, omin, P = _conv_maps(7, 3, 1, True)
    assert (kk, omin, P) == (5, -2, 4)
    return np.asarray(A), np.asarray(B), np.asarray(M)


def expand_tail_weight(w: jax.Array) -> jax.Array:
    """(7,7,ci,co) image kernel -> (5,5,4ci,4co) s2d phase kernel with
    channel order in-(qh,qw,ci) / out-(dh,dw,co), matching conv_on_s2d."""
    A, B, M = _tail_maps()
    wk = w[jnp.asarray(A), jnp.asarray(B)]          # (5,5,4,4,ci,co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    ci, co = w.shape[2], w.shape[3]
    return wk.transpose(0, 1, 2, 4, 3, 5).reshape(5, 5, 4 * ci, 4 * co)


def _phase_masks(c4: int):
    """(1, 1, c4) bool lane masks selecting the phase_h-0 halves and the
    phase_w-0 quarters of the s2d channel blocks. Built with
    broadcasted_iota (lane-offset concats of sub-128 channel slices do
    not compile in Mosaic; full-width selects do)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c4), 2)
    mask_h0 = ch < (c4 // 2)
    mask_w0 = (ch % (c4 // 2)) < (c4 // 4)
    return mask_h0, mask_w0


def _row_mix(xa, xb, mask_h0):
    """Halo row: phase_h-0 half from row ``xa``, phase_h-1 from ``xb``."""
    return jnp.where(mask_h0, xa, xb)


def _col_mix(x, a, b, mask_w0):
    """Halo column: phase_w-0 quarters (blocks 0, 2) from col ``a``,
    phase_w-1 quarters (blocks 1, 3) from col ``b``."""
    return jnp.where(mask_w0, x[:, a:a + 1, :], x[:, b:b + 1, :])


def _tail_kernel(xs_hbm, wk_ref, b_ref, out_ref, xt2, sem, *, tile: int,
                 hs: int, ws: int, c4: int):
    """One grid step = ``tile`` s2d rows -> ``2*tile`` image rows.

    ``xs_hbm`` is the 2-D row-major view (hs, ws*c4) of the s2d
    activation — a free reshape for the caller, and a shape whose pinned
    default layout can't push a pathological dim order back into the
    producer graph (the 4-d operand made XLA retile every upstream conv).
    """
    i = pl.program_id(0)
    u0 = i * tile
    first = i == 0
    last = i == pl.num_programs(0) - 1
    mask_h0, mask_w0 = _phase_masks(c4)
    mask_h0_2d = mask_h0  # 3-D refs again; alias kept for the patches

    # --- load into the slot convention "slot s holds xs row u0-2+s":
    # interior tiles fill all tile+4 slots from HBM; edge tiles leave the
    # out-of-range slots to the reflect patches below.
    lo = jnp.maximum(u0 - 2, 0)
    d0 = jnp.where(first, 2, 0)
    dma = pltpu.make_async_copy(
        xs_hbm.at[pl.ds(lo, tile + 2)], xt2.at[pl.ds(d0, tile + 2)],
        sem)
    dma.start()
    dma.wait()
    lo2 = jnp.minimum(u0 + tile, hs - 2)
    dma2 = pltpu.make_async_copy(
        xs_hbm.at[pl.ds(lo2, 2)], xt2.at[pl.ds(tile + 2, 2)], sem)
    dma2.start()
    dma2.wait()

    # --- reflect row halo (same-phase algebra: image row -k reflects to
    # +k, an even distance, so each halo row is a phase_h-masked blend of
    # two interior rows). Patched in the scratch under pl.when.
    @pl.when(first)
    def _():
        # slot 0 = img rows (-4, -3) -> (4, 3) = (xs[2] ph0, xs[1] ph1)
        xt2[0:1] = jnp.where(mask_h0_2d, xt2[4:5], xt2[3:4])
        # slot 1 = img rows (-2, -1) -> (2, 1) = (xs[1] ph0, xs[0] ph1)
        xt2[1:2] = jnp.where(mask_h0_2d, xt2[3:4], xt2[2:3])

    @pl.when(last)
    def _():
        t = tile
        # slot t+2 = img (2hs, 2hs+1) -> (2hs-2, 2hs-3)
        xt2[t + 2:t + 3] = jnp.where(mask_h0_2d, xt2[t + 1:t + 2],
                                     xt2[t:t + 1])
        # slot t+3 = img (2hs+2, 2hs+3) -> (2hs-4, 2hs-5)
        xt2[t + 3:t + 4] = jnp.where(mask_h0_2d, xt2[t:t + 1],
                                     xt2[t - 1:t])

    x = xt2[:, :, :]  # (tile+4, ws, c4)

    # --- reflect column halo (every tile) -------------------------------
    c_m2 = _col_mix(x, 2, 1, mask_w0)
    c_m1 = _col_mix(x, 1, 0, mask_w0)
    c_p1 = _col_mix(x, ws - 1, ws - 2, mask_w0)
    c_p2 = _col_mix(x, ws - 2, ws - 3, mask_w0)
    xe = jnp.concatenate([c_m2, c_m1, x, c_p1, c_p2], axis=1)

    # --- 25 offset matmuls on the MXU, fp32 accumulator -----------------
    acc = jnp.zeros((tile * ws, 12), jnp.float32)
    for a in range(5):
        for b in range(5):
            xab = xe[a:a + tile, b:b + ws, :].reshape(tile * ws, c4)
            acc = acc + jax.lax.dot_general(
                xab, wk_ref[a, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    y = jnp.tanh(acc + b_ref[0]).astype(out_ref.dtype)
    # acc channel layout is dh*6 + dw*3 + c; emit (tile, 2, ws, 6) whose
    # row-major flattening IS the image — only lane *slices* and
    # leading-dim reshapes, which Mosaic supports (a (.,12)->(.,2,2,3)
    # lane-dim reshape does not compile)
    y0 = y[:, 0:6].reshape(tile, ws, 6)   # dh = 0 rows
    y1 = y[:, 6:12].reshape(tile, ws, 6)  # dh = 1 rows
    out_ref[:, :, :, :] = jnp.stack([y0, y1], axis=1)


def tail_fused_supported(xs_shape, w_shape, tile: int = 16) -> bool:
    n, hs, ws, c4 = xs_shape
    return (n == 1 and w_shape[0] == 7 and w_shape[3] == 3
            and c4 == 4 * w_shape[2] and c4 in (128, 256)
            and hs % tile == 0 and hs >= 2 * tile and ws >= 4)


def tail_fused(xs: jax.Array, w: jax.Array, b: jax.Array,
               tile: int = 16, interpret: bool = False) -> jax.Array:
    """(1, Hs, Ws, 4C) s2d activation + (7,7,C,3) image kernel + (3,)
    bias -> (1, 2Hs, 2Ws, 3) tanh'd image. Exact fused equivalent of
    reflect_pad_s2d(3) -> conv_on_s2d(k=7) -> +bias -> tanh -> from_s2d.
    """
    n, hs, ws, c4 = xs.shape
    assert tail_fused_supported(xs.shape, w.shape, tile), (xs.shape,
                                                           w.shape)
    wk = expand_tail_weight(w.astype(xs.dtype))
    b12 = jnp.tile(b.astype(jnp.float32), 4)[None]  # (1, 12)
    grid = hs // tile
    kernel = functools.partial(_tail_kernel, tile=tile, hs=hs, ws=ws,
                               c4=c4)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # xs stays in HBM
            pl.BlockSpec((5, 5, c4, 12), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 2, ws, 6), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hs, 2, ws, 6), xs.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 4, ws, c4), xs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xs.reshape(hs, ws, c4), wk, b12)
    # (hs, 2, ws, 6) -> (2hs, 2ws, 3) is a row-major identity reshape:
    # flat index ((u*2+dh)*ws+v)*6 + dw*3+c == ((2u+dh)*2ws + 2v+dw)*3 + c
    return out.reshape(2 * hs, 2 * ws, 3)[None]
