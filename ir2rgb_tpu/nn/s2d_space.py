"""Persistent space-to-depth execution of the high-resolution layers.

Profiling the 512px generators (see s2d_conv.py for the per-conv variant)
showed ~60% of frame time in layout copies/reshapes: NHWC tensors with
3..64 channels bounce between XLA's preferred conv layouts, and per-conv
s2d wrapping added its own transposes. The fix is representational: the
full-resolution segment of the network (head, first downsampler, last
upsampler, tail, enhancer branch) runs END-TO-END on the s2d
representation

    xs = s2d(x):  (N, H, W, C)  ->  (N, H/2, W/2, 4C)

with channel blocks ordered (phase_h, phase_w, C). Entering costs one
cheap transform of the 3-channel input; leaving costs one on the
3-channel output; every op in between is exact in s2d space:

- ``conv_on_s2d``: zero-padded convs of any kernel/pad, stride 1 (s2d out)
  or stride 2 (s2d-of-half-res out or normal out). Zero padding on the
  s2d grid corresponds exactly to zero padding in image space.
- ``reflect_pad_s2d``: ReflectionPad2d in s2d space — per output phase a
  concat of row/col slices of the proper source phases (aligned,
  layout-preserving copies instead of the relayouting copies the direct
  pad provoked).
- ``instance_norm_act_s2d``: per-original-channel fp32 stats reduced over
  space AND the four phase blocks (exactly the image-space statistics).
- ``deconv_to_s2d``: the subpixel transposed conv (ops.deconv_apply)
  already computes phase channels; keeping them IS the s2d output.

All transformations are exact (element-equality tested against the
image-space ops in tests/test_s2d_space.py).
"""

from __future__ import annotations

import functools
import os


import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .s2d_conv import depth_to_space, space_to_depth
from ir2rgb_tpu.nn import quant


def to_s2d(x: jax.Array) -> jax.Array:
    return space_to_depth(x)


def from_s2d(xs: jax.Array, c: int) -> jax.Array:
    return depth_to_space(xs, c)


# ---------------------------------------------------------------------------
# Convolution on the s2d grid
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _conv_maps(k: int, pad: int, stride: int, out_s2d: bool):
    """Static gather maps for the dense s2d-grid kernel.

    Math (1D): out[m] = sum_r w[r] x[m*stride + r - pad]. With x in s2d
    (phase q, j = (u-q)/2) and out phase d (j_out = (m-d)/2 for stride 1;
    for stride 2, m*2 keeps out on the s2d grid of the half-res image):
    tap offsets relative to j_out are affine, so each (d, q) pair yields a
    sub-kernel; zero taps outside [0,H) map to zero padding on the s2d
    grid.
    """
    out_phases = (0, 1) if (stride == 1 or out_s2d) else (0,)
    # For stride 2 with s2d output: out[m], m = 2i + d, taps
    # u = 2m + r - pad = 4i + 2d + r - pad; q = u%2, j = i*2 + (2d+r-pad-q)/2
    # -> conv over j with stride 2 and offset (2d+r-pad-q)/2.
    entries = {}
    offs = []
    for d in out_phases:
        for q in (0, 1):
            taps = []
            for r in range(k):
                if stride == 1:
                    u_rel = d + r - pad          # u = 2*j_out + u_rel
                else:
                    u_rel = 2 * d + r - pad      # u = 4*i + u_rel (j=2i+...)
                if u_rel % 2 == q % 2:
                    o = (u_rel - q) // 2
                    taps.append((o, r))
                    offs.append(o)
            entries[(d, q)] = taps
    omin, omax = min(offs), max(offs)
    kk = omax - omin + 1
    P = len(out_phases) ** 2
    A = np.zeros((kk, kk, 4, P), np.int32)
    B = np.zeros((kk, kk, 4, P), np.int32)
    M = np.zeros((kk, kk, 4, P), bool)
    np_ = len(out_phases)
    for dh in out_phases:
        for dw in out_phases:
            pout = dh * np_ + dw
            for qh in (0, 1):
                for qw in (0, 1):
                    qidx = qh * 2 + qw
                    for oa, ra in entries[(dh, qh)]:
                        for ob, rb in entries[(dw, qw)]:
                            A[oa - omin, ob - omin, qidx, pout] = ra
                            B[oa - omin, ob - omin, qidx, pout] = rb
                            M[oa - omin, ob - omin, qidx, pout] = True
    return A, B, M, kk, omin, P


def conv_on_s2d(xs: jax.Array, w: jax.Array, stride: int = 1, pad: int = 0,
                out_s2d: bool = True,
                precision=lax.Precision.HIGHEST) -> jax.Array:
    """Convolve the image underlying ``xs`` (s2d rep) with zero padding
    ``pad``. Output: s2d rep of the conv result (out_s2d=True) or the
    plain rep (only stride=2, which lands on the half-res grid)."""
    if not out_s2d and stride != 2:
        raise ValueError(
            "conv_on_s2d: plain-rep output (out_s2d=False) is only "
            "implemented for stride=2; a stride-1 plain rep would need "
            "an explicit depth_to_space on the s2d result")
    n, hs, ws, c4 = xs.shape
    ci = c4 // 4
    k, co = w.shape[0], w.shape[3]
    A, B, M, kk, omin, P = _conv_maps(k, pad, stride, out_s2d)
    wk = w[jnp.asarray(A), jnp.asarray(B)]
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    wk = wk.transpose(0, 1, 2, 4, 3, 5).reshape(kk, kk, 4 * ci, P * co)

    def dim_plan(s):
        """(j_out, conv_stride, hi_pad) for one spatial dim of s2d size s."""
        d_out = (s * 2 + 2 * pad - k) // stride + 1
        if stride == 1:
            j, cs = (d_out + 1) // 2, 1
        elif out_s2d:
            j, cs = (d_out + 1) // 2, 2
        else:
            # stride-2 image conv, plain output: out[i] taps u = 2i+r-pad,
            # i.e. s2d position j = i + offset -> unit-stride grid conv
            j, cs = d_out, 1
        hi = max((j - 1) * cs + (kk - 1 + omin) - (s - 1), 0)
        return d_out, j, cs, hi

    h_out, jh, cs, hi_h = dim_plan(hs)
    w_out, jw, _, hi_w = dim_plan(ws)
    lo = -omin
    y = quant.conv(
        xs, wk, window_strides=(cs, cs),
        padding=[(lo, hi_h), (lo, hi_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32 if xs.dtype == jnp.float32
        else None,
    )
    y = y[:, :jh, :jw, :]
    if not out_s2d and stride == 2:
        return y
    # s2d output: trim odd h_out by zeroing is unnecessary — callers in the
    # generators always produce even h_out; assert to catch misuse.
    assert h_out % 2 == 0 and w_out % 2 == 0, \
        "s2d output requires even output size"
    return y


# ---------------------------------------------------------------------------
# Image -> s2d fused head convolution
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _image_to_s2d_maps(k: int, stride: int):
    """Gather maps for the fused image->s2d kernel: out_phase d at s2d
    position j = sum_r w[r] xpad[2*stride*j + stride*d + r] — one conv over
    the image with stride 2s, window k+s, and 4*cout phase channels. The
    input is read in its natural image layout — no s2d intermediate."""
    kk = k + stride
    A = np.zeros((kk, kk, 4), np.int32)
    B = np.zeros((kk, kk, 4), np.int32)
    M = np.zeros((kk, kk, 4), bool)
    for dh in (0, 1):
        for dw in (0, 1):
            pidx = dh * 2 + dw
            for uh in range(kk):
                rh = uh - stride * dh
                if not (0 <= rh < k):
                    continue
                for uw in range(kk):
                    rw = uw - stride * dw
                    if not (0 <= rw < k):
                        continue
                    A[uh, uw, pidx] = rh
                    B[uh, uw, pidx] = rw
                    M[uh, uw, pidx] = True
    return A, B, M, kk


def conv_image_to_s2d(x: jax.Array, w: jax.Array, stride: int = 1,
                      pad: int = 0,
                      precision=lax.Precision.HIGHEST) -> jax.Array:
    """Conv of an image (plain rep, zero padding ``pad``), emitting the
    s2d rep of the (stride-decimated) result directly — exact. The
    generators' c7s1 heads (stride 1, manually reflect-padded inputs) and
    the VGG/discriminator entry convs (stride 1/2, zero pad) use this so
    channel-starved inputs are touched exactly once. Output image size
    must be even.

    Round-3 note — the im2col+matmul lowering
    (``conv_image_to_s2d_im2col``, IR2RGB_HEAD=im2col) measured 13-52%
    faster STANDALONE at 256-512 px on the v5e (head+IN+relu segment:
    629->475 us at 512/ngf64, 109->52 at 256/ngf64) but LOSES IN
    CONTEXT: with it enabled the full 512p generators regress 285->272
    fps (local) and 297->216 fps (temporal) — the patch-concat's layout
    requirements retile neighbouring ops, the same propagation failure
    mode as the Pallas tail kernel (docs/DESIGN.md §4). Default is the
    direct form everywhere; the im2col path stays as the measured
    record + an opt-in for standalone/export use."""
    k, _, ci, co = w.shape
    if (stride == 1 and k % 2 == 1 and jax.default_backend() == "tpu"
            and os.environ.get("IR2RGB_HEAD", "direct") == "im2col"):
        return _conv_i2s_im2col_vjp(pad, precision, x, w)
    return _conv_i2s_direct(x, w, stride, pad, precision)


def _conv_i2s_direct(x: jax.Array, w: jax.Array, stride: int, pad: int,
                     precision) -> jax.Array:
    k, _, ci, co = w.shape
    h, wd = x.shape[1], x.shape[2]
    h_out = (h + 2 * pad - k) // stride + 1
    w_out = (wd + 2 * pad - k) // stride + 1
    assert h_out % 2 == 0 and w_out % 2 == 0, \
        "s2d output requires even conv output size"
    A, B, M, kk = _image_to_s2d_maps(k, stride)
    wk = w[jnp.asarray(A), jnp.asarray(B)]              # (kk,kk,4,ci,co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    wk = wk.transpose(0, 1, 3, 2, 4).reshape(kk, kk, ci, 4 * co)
    # taps x[2s*j + u - pad] for u in [0, kk): conv padding lo = pad;
    # hi covers the final window — per spatial dim (non-square inputs)
    lo = pad
    hi_h = max((h_out // 2 - 1) * 2 * stride + kk - 1 - pad - (h - 1), 0)
    hi_w = max((w_out // 2 - 1) * 2 * stride + kk - 1 - pad - (wd - 1), 0)
    y = quant.conv(
        x, wk, window_strides=(2 * stride, 2 * stride),
        padding=[(lo, hi_h), (lo, hi_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )
    return y[:, :h_out // 2, :w_out // 2, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_i2s_im2col_vjp(pad, precision, x, w):
    """im2col forward with the DIRECT conv's backward (same function, so
    its linear transpose is exact): autodiff through the im2col concat
    would scatter the cotangent through 16 padded slice-adds; the direct
    transposed conv is what XLA lowers well (same pattern as
    conv_on_s2d_wide's custom VJP)."""
    return conv_image_to_s2d_im2col(x, w, pad=pad, precision=precision)


def _conv_i2s_fwd(pad, precision, x, w):
    return _conv_i2s_im2col_vjp(pad, precision, x, w), (x, w)


def _conv_i2s_bwd(pad, precision, res, ct):
    x, w = res

    def direct_x(v):
        return _conv_i2s_direct(v, w, 1, pad, precision)

    def direct_w(v):
        return _conv_i2s_direct(x, v, 1, pad, precision)

    dx = jax.linear_transpose(direct_x, x)(ct)[0]
    dw = jax.linear_transpose(direct_w, w)(ct)[0]
    return dx, dw


_conv_i2s_im2col_vjp.defvjp(_conv_i2s_fwd, _conv_i2s_bwd)


@functools.lru_cache(maxsize=None)
def _im2col_maps(k: int):
    """Index/mask arrays for the im2col head lowering (stride 1, odd k):
    out[j, (dh,dw)] = sum_r w[r] xpad[2j+d+r]; with xpad folded to s2d
    (cell j+s, phase q), the tap is r = 2s + q - d. Returns (A, B, M,
    kk2): rh/rw index arrays of shape (kk2, kk2, 2, 2, 2, 2) over
    (sh, sw, qh, qw, dh, dw), validity mask, and the s2d window kk2."""
    kk2 = k // 2 + 1
    A = np.zeros((kk2, kk2, 2, 2, 2, 2), np.int32)
    B = np.zeros((kk2, kk2, 2, 2, 2, 2), np.int32)
    M = np.zeros((kk2, kk2, 2, 2, 2, 2), bool)
    for sh in range(kk2):
        for sw in range(kk2):
            for qh in (0, 1):
                for qw in (0, 1):
                    for dh in (0, 1):
                        for dw in (0, 1):
                            rh = 2 * sh + qh - dh
                            rw = 2 * sw + qw - dw
                            if 0 <= rh < k and 0 <= rw < k:
                                A[sh, sw, qh, qw, dh, dw] = rh
                                B[sh, sw, qh, qw, dh, dw] = rw
                                M[sh, sw, qh, qw, dh, dw] = True
    return A, B, M, kk2


def conv_image_to_s2d_im2col(x: jax.Array, w: jax.Array, pad: int = 0,
                             precision=lax.Precision.HIGHEST) -> jax.Array:
    """The head conv as explicit im2col + ONE dense matmul.

    XLA's conv engine iterates k*k taps with K = ci per MXU pass — for
    the generators' 3-channel c7s1 heads that is 49-64 passes at 2% K
    utilization, leaving the head conv MXU-pass-limited (round-3
    profile: 1.34 ms at 1024p, 5.1 ms at 2048p in-context). Here the
    padded image folds to s2d (12 channels), the (k//2+1)^2 s2d window
    is gathered as shifted slices concatenated on channels (one copy
    pass), and a single (M, kk2^2*4*ci) x (.., 4*co) dot emits the s2d
    rep — ceil(K/128) MXU passes instead of k*k.

    Measured on the v5e (exp_head_conv.py, head+IN+relu segment): WINS
    25% at 512px/ngf64 (629 -> 475 us — the global-512 trunk head and
    every tier's trunk head); LOSES at >=1024px full-res enhancer heads
    (1983 -> 2974 us at 1024/ngf32) where the patch buffer's lane-padded
    slice reads dominate. NOTE: IR2RGB_HEAD=im2col is all-or-nothing —
    the conv_image_to_s2d gate checks only stride/k/backend, so the knob
    routes EVERY stride-1 odd-k head through here, including the
    >=1024px enhancer heads where it loses; it is a standalone-
    measurement opt-in, not a tuned default. Exact same math (0/1
    gather of w, fp32 MXU accumulation); stride-1 odd-k only."""
    k, _, ci, co = w.shape
    assert k % 2 == 1, "im2col head path requires odd k"
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    out_h, out_w = h - k + 1, wd - k + 1
    assert out_h % 2 == 0 and out_w % 2 == 0, \
        "s2d output requires even conv output size"
    xs = space_to_depth(x)                      # (n, h/2, w/2, 4ci)
    A, B, M, kk2 = _im2col_maps(k)
    out_sh, out_sw = out_h // 2, out_w // 2
    patches = jnp.concatenate(
        [xs[:, sh:sh + out_sh, sw:sw + out_sw, :]
         for sh in range(kk2) for sw in range(kk2)], axis=-1)
    wk = w[jnp.asarray(A), jnp.asarray(B)]      # (...,2,2, ci, co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    # (sh,sw,qh,qw,dh,dw,ci,co) -> (sh,sw,qh,qw,ci,dh,dw,co)
    wk = wk.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    wk = wk.reshape(kk2 * kk2 * 4 * ci, 4 * co).astype(x.dtype)
    y = quant.dot(patches, wk, (((3,), (0,)), ((), ())),
                        mixed_ch=(ci, co),
                        precision=precision,
                        preferred_element_type=jnp.float32
                        if x.dtype == jnp.float32 else None)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _fold4_head_maps(k: int):
    """Gather maps for the fold-4 head conv (stride 1, odd k).

    The image folds 4x4 into 16ci channels; each fold-4 output cell t
    hosts 2x2 s2d cells (sub-position e) each with 2x2 image phases d,
    so one conv with window kk = (k+2)//4 + 1 and 16co phase-expanded
    output channels computes the whole head: tap r lives at cell offset
    o = (2e + d + r) // 4, intra-cell row u = (2e + d + r) % 4, i.e.
    r = 4o + u - 2e - d when 0 <= r < k. Output channel order
    (e_h, e_w, d_h, d_w, co) is exactly the quad-phase deconv's pre-d2s
    layout, so the same depth_to_space(+pre-d2s instance norm) finishes
    the job."""
    kk = (k + 2) // 4 + 1
    A = np.zeros((kk, kk, 4, 4, 2, 2, 2, 2), np.int32)
    B = np.zeros((kk, kk, 4, 4, 2, 2, 2, 2), np.int32)
    M = np.zeros((kk, kk, 4, 4, 2, 2, 2, 2), bool)
    for oh in range(kk):
        for ow in range(kk):
            for uh in range(4):
                for uw in range(4):
                    for eh in (0, 1):
                        for ew in (0, 1):
                            for dh in (0, 1):
                                for dw in (0, 1):
                                    rh = 4 * oh + uh - 2 * eh - dh
                                    rw = 4 * ow + uw - 2 * ew - dw
                                    if 0 <= rh < k and 0 <= rw < k:
                                        idx = (oh, ow, uh, uw, eh, ew,
                                               dh, dw)
                                        A[idx] = rh
                                        B[idx] = rw
                                        M[idx] = True
    return A, B, M, kk


def head_fold4_in_act_s2d(x: jax.Array, w: jax.Array, b=None,
                          act: str = "relu",
                          precision=lax.Precision.HIGHEST) -> jax.Array:
    """c7s1 head + instance norm + activation via a fold-4 conv.

    The direct head conv is MXU-pass-limited: XLA iterates k*k taps with
    K = 3 per pass (64 passes for k=7 — 5.1 ms at 2048p). Folding the
    reflect-padded image 4x4 (48 input channels) turns it into kk^2 = 9
    taps of K = 48 with N = 16co phase channels; the norm runs on the
    pre-d2s 16-phase rep (deconv_in_act_s2d's trick) and one
    depth-to-space emits the s2d rep. Exact: 0/1 gather of w, same
    conv/reduce arithmetic.

    ``x`` must already carry the conv's padding (the generators
    reflect-pad); output image size must be divisible by 4."""
    k, _, ci, co = w.shape
    _, h, wd, _ = x.shape
    out_h, out_w = h - k + 1, wd - k + 1
    assert out_h % 4 == 0 and out_w % 4 == 0, \
        "fold-4 head needs output divisible by 4"
    A, B, M, kk = _fold4_head_maps(k)
    # pad H/W up to a multiple of 4: the extra rows/cols sit beyond every
    # valid tap (the kernel map zeroes any (o, u) pair whose r falls
    # outside the window), so zero-fill is exact
    hp = -h % 4
    wp = -wd % 4
    if hp or wp:
        x = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)))
    xs4 = fold4_of_image(x)

    wk = w[jnp.asarray(A), jnp.asarray(B)]  # (kk,kk,4,4,2,2,2,2,ci,co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    # -> (oh,ow, uh,uw,ci, eh,ew,dh,dw,co)
    wk = wk.transpose(0, 1, 2, 3, 8, 4, 5, 6, 7, 9)
    wk = wk.reshape(kk, kk, 16 * ci, 16 * co).astype(x.dtype)

    y = quant.conv(
        xs4, wk, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )
    y = y[:, :out_h // 4, :out_w // 4, :]
    if b is not None:
        y = y + jnp.tile(b.astype(y.dtype), 16)
    y = instance_norm_act_s2d(y, act, phases=16)
    return depth_to_space(y, 4 * co)


@functools.lru_cache(maxsize=None)
def _fold4_tail_maps(k: int):
    """Gather maps for the tail conv reading the quad-phase deconv's
    PRE-d2s rep (which is a fold-4 rep with channel blocks ordered
    (e_h, e_w, d_h, d_w, ci); image offset within a cell v = 2e + d).

    Output image index m = 4t + v_out; tap r with pad p=(k-1)//2 reads
    input i = m + r - p = 4(t + o) + v_in with o = floor((v_out+r-p)/4)
    in {-1,0,1} -> window 3 with cell-level zero padding (1,1); the
    border strips are reflect-recomputed by the caller."""
    p = (k - 1) // 2
    kk = 3
    A = np.zeros((kk, kk, 4, 4, 4, 4), np.int32)   # (oh,ow,vin_h,vin_w,vout_h,vout_w)
    B = np.zeros((kk, kk, 4, 4, 4, 4), np.int32)
    M = np.zeros((kk, kk, 4, 4, 4, 4), bool)
    for vo_h in range(4):
        for r_h in range(k):
            t_h = vo_h + r_h - p
            oh, vi_h = t_h // 4 + 1, t_h % 4
            for vo_w in range(4):
                for r_w in range(k):
                    t_w = vo_w + r_w - p
                    ow, vi_w = t_w // 4 + 1, t_w % 4
                    A[oh, ow, vi_h, vi_w, vo_h, vo_w] = r_h
                    B[oh, ow, vi_h, vi_w, vo_h, vo_w] = r_w
                    M[oh, ow, vi_h, vi_w, vo_h, vo_w] = True
    return A, B, M, kk


def tail_fold4_body(y4: jax.Array, w: jax.Array) -> jax.Array:
    """Zero-padded tail conv on the pre-d2s (fold-4) rep: one conv of
    window 3, K = 16*ci, N = 16*co — replaces [d2s + 25-tap wide conv]
    for the final enhancer level. ``y4`` channels ordered
    (e_h, e_w, d_h, d_w, ci). Output: fold-4 rep of the conv result
    (v-major channel blocks, co minor). Borders (within (k-1)//2 px)
    assume zero padding — the caller patches reflect-correct strips."""
    k, _, ci, co = w.shape
    A, B, M, kk = _fold4_tail_maps(k)
    wk = w[jnp.asarray(A), jnp.asarray(B)]  # (kk,kk,4,4,4,4,ci,co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    # input channel block (e_h,e_w,d_h,d_w) = (vh//2, vw//2, vh%2, vw%2)
    vi = np.arange(4)
    perm_in = ((vi[:, None] // 2 * 2 + vi[None, :] // 2) * 4
               + vi[:, None] % 2 * 2 + vi[None, :] % 2)  # (vh,vw)->block
    # reorder wk's (vin_h, vin_w) axes into the deconv's channel order:
    # build (kk,kk,16in,ci,16out,co) with 16in indexed by the deconv
    # block id
    wk = wk.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # (kk,kk,vih,viw,ci,voh,vow,co)
    wk = wk.reshape(kk, kk, 16, ci, 16, co)
    inv = np.argsort(perm_in.reshape(16))       # deconv block -> (vh,vw)
    wk = wk[:, :, jnp.asarray(inv)]
    wk = wk.reshape(kk, kk, 16 * ci, 16 * co).astype(y4.dtype)
    prec = (lax.Precision.DEFAULT if y4.dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)
    return quant.conv(
        y4, wk, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec,
        preferred_element_type=jnp.float32 if y4.dtype == jnp.float32
        else None,
    )


@functools.lru_cache(maxsize=None)
def _stride4_select_mats(n_out: int, dtype_name: str):
    """E_v: (4*n_out, n_out) 0/1 with E_v[4j+v, j] = 1 — stride-4
    deinterleave (fold) as a matmul; transposed, the stride-4
    interleave (unfold)."""
    mats = []
    for v in range(4):
        m = np.zeros((4 * n_out, n_out), np.dtype(dtype_name))
        m[np.arange(n_out) * 4 + v, np.arange(n_out)] = 1
        mats.append(m)
    return tuple(mats)


def _fold_prec(dtype):
    # HIGHEST keeps f32 exact through 0/1 dots (XLA's default decomposes
    # f32 dots into truncating bf16 passes)
    return (lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)


def fold4_of_image_dot(x: jax.Array) -> jax.Array:
    """fold4_of_image as stride-4 selection matmuls on the MXU.

    The 6-d reshape/transpose form moves a 3-channel tensor through
    T(8,128) tiles at ~15 GB/s (round-3 2048p profile: 2.36 ms to fold
    the input image); the 0/1-matmul form rides the MXU instead — the
    same trick as s2d_conv._d2s_dot, one fold level up. Exact."""
    n, H, W, c = x.shape
    h4, w4 = H // 4, W // 4
    ew = [jnp.asarray(m) for m in _stride4_select_mats(w4, x.dtype.name)]
    eh = [jnp.asarray(m) for m in _stride4_select_mats(h4, x.dtype.name)]
    prec = _fold_prec(x.dtype)
    ein = functools.partial(jnp.einsum, precision=prec)
    cols = [ein("nhwc,wj->nhjc", x, e) for e in ew]       # (n,H,w4,c) x4
    out = []
    for uh in range(4):
        for uw in range(4):
            out.append(ein("nhjc,hi->nijc", cols[uw], eh[uh]))
    return jnp.concatenate(out, axis=-1).astype(x.dtype)  # (uh,uw,c)


def unfold4_dot(y: jax.Array, c: int, order: str = "v") -> jax.Array:
    """unfold4 (order='v') / unfold4_deconv (order='deconv') as stride-4
    interleave matmuls — replaces the 2.9 ms reshape/transpose chain the
    round-3 2048p profile showed for the 3-channel tail output."""
    n, h4, w4, _ = y.shape
    ew = [jnp.asarray(m.T) for m in _stride4_select_mats(w4, y.dtype.name)]
    eh = [jnp.asarray(m.T) for m in _stride4_select_mats(h4, y.dtype.name)]
    prec = _fold_prec(y.dtype)
    ein = functools.partial(jnp.einsum, precision=prec)

    def block(uh, uw):
        if order == "v":
            bid = uh * 4 + uw
        else:  # deconv channel order (e_h, e_w, d_h, d_w)
            bid = ((uh // 2 * 2 + uw // 2) * 2 + uh % 2) * 2 + uw % 2
        return y[..., bid * c:(bid + 1) * c]

    rows = []
    for uh in range(4):
        acc = None
        for uw in range(4):
            t = ein("nhjc,jw->nhwc", block(uh, uw), ew[uw])
            acc = t if acc is None else acc + t
        rows.append(acc)                                  # (n,h4,4w4,c)
    out = None
    for uh in range(4):
        t = ein("nhwc,hi->niwc", rows[uh], eh[uh])
        out = t if out is None else out + t
    return out.astype(y.dtype)                            # (n,4h4,4w4,c)


@functools.lru_cache(maxsize=None)
def _vmajor_to_bitsplit_perm(c: int):
    """Channel permutation (v-major (vh, vw, c), vh = 2a+b) ->
    (a_h, a_w, b_h, b_w, c): after it, one depth_to_space over (a_h,
    a_w) yields the s2d rep (phase order (b_h, b_w, c)), and a second
    over (b_h, b_w) yields the image — each a 2x interleave that the
    selection-matmul d2s handles far cheaper than a direct 4x
    interleave."""
    perm = np.zeros(16 * c, np.int32)
    i = 0
    for ah in (0, 1):
        for aw in (0, 1):
            for bh in (0, 1):
                for bw in (0, 1):
                    vh, vw = 2 * ah + bh, 2 * aw + bw
                    for cc in range(c):
                        perm[i] = (vh * 4 + vw) * c + cc
                        i += 1
    return perm


def unfold4_double_d2s(y: jax.Array, c: int) -> jax.Array:
    """unfold4 as two 2x selection-matmul interleaves (outer phases
    then inner) — the direct 4x interleave einsums cost ~1.6 ms for the
    2048p tail output; two d2s-dot passes are ~2x cheaper (the channel
    permute fuses into the producer)."""
    yp = y[..., jnp.asarray(_vmajor_to_bitsplit_perm(c))]
    mid = _d2s_dot_any(yp, 4 * c)        # (n, 2h4, 2w4, 4c) s2d rep
    return _d2s_dot_any(mid, c)          # (n, 4h4, 4w4, c) image


def _d2s_dot_any(y: jax.Array, co: int) -> jax.Array:
    """depth_to_space via selection matmuls regardless of the co<=8
    production gate (callers here know the matmul form wins)."""
    from .s2d_conv import _d2s_dot
    return _d2s_dot(y, co)


def unfold4(y: jax.Array, c: int) -> jax.Array:
    """(n, h4, w4, 16c) v-major fold-4 rep -> (n, 4h4, 4w4, c) image."""
    if jax.default_backend() == "tpu":
        mode = os.environ.get("IR2RGB_FOLD", "dot")
        if mode == "dot":
            return unfold4_double_d2s(y, c)
        if mode == "dot4":
            return unfold4_dot(y, c, order="v")
    n, h4, w4, _ = y.shape
    y = y.reshape(n, h4, w4, 4, 4, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 4 * h4, 4 * w4, c)


def unfold4_deconv(y: jax.Array, c: int) -> jax.Array:
    """Unfold the deconv's pre-d2s rep — channel blocks ordered
    (e_h, e_w, d_h, d_w, c), image offset v = 2e + d — to the image."""
    n, h4, w4, _ = y.shape
    y = y.reshape(n, h4, w4, 2, 2, 2, 2, c)
    y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (n,h4,eh,dh,w4,ew,dw,c)
    return y.reshape(n, 4 * h4, 4 * w4, c)


def fold4_of_image(x: jax.Array) -> jax.Array:
    """(n, H, W, c) -> (n, H/4, W/4, 16c), v-major channel blocks."""
    if jax.default_backend() == "tpu" and os.environ.get(
            "IR2RGB_FOLD", "dot") == "dot":
        return fold4_of_image_dot(x)
    n, h, w, c = x.shape
    x = x.reshape(n, h // 4, 4, w // 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c)


def tail_from_fold4(y4: jax.Array, w: jax.Array, b=None,
                    out_nc: int = 3) -> jax.Array:
    """Generator tail (reflect-pad (k-1)//2 + c7s1 conv + tanh) reading
    the final deconv's PRE-d2s rep directly, emitting the image.

    Skips the deconv's depth-to-space entirely (at 2048p that transpose
    alone cost ~755 us) and runs the tail as a 9-tap K=16ci conv on full
    128-lane channels instead of the 25-pass wide matmul on the
    half-lane s2d rep. Zero-pad body + exact reflect strips: the
    (k-1)//2-pixel borders are recomputed in image space from a thin
    unfolded slice (the conv_reflect_s2d recipe, one fold level up)."""
    k, _, ci, co = w.shape
    p = (k - 1) // 2
    n, h4, w4, _ = y4.shape
    H, W = 4 * h4, 4 * w4
    body = tail_fold4_body(y4, w)                    # (n, h4, w4, 16co)
    if b is not None:
        body = body + jnp.tile(b.astype(body.dtype), 16)
    body = jnp.tanh(body.astype(jnp.float32)).astype(y4.dtype)
    out = unfold4(body, co)                          # (n, 4h4, 4w4, co)

    # zero-pad error region = outputs within p px of each border; the
    # strip conv needs 2p interior image rows/cols, = ceil(2p/4) cells
    sc = (2 * p + 3) // 4

    def reflect_conv(sub):
        subp = jnp.pad(sub, ((0, 0), (p, p), (p, p), (0, 0)),
                       mode="reflect")
        y = quant.conv(
            subp, w.astype(sub.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=(lax.Precision.DEFAULT
                       if sub.dtype == jnp.bfloat16
                       else lax.Precision.HIGHEST))
        if b is not None:
            y = y + b.astype(y.dtype)
        return jnp.tanh(y.astype(jnp.float32)).astype(sub.dtype)

    # NB the strip's reflect pad on its slice-interior side is wrong,
    # but only rows/cols < p from the TRUE border are kept — those read
    # interior rows <= 2p-1, all inside the slice
    top = reflect_conv(unfold4_deconv(y4[:, :sc], ci))[:, :p]
    bot = reflect_conv(unfold4_deconv(y4[:, h4 - sc:], ci))[:, -p:]
    out = out.at[:, :p, :, :].set(top)
    out = out.at[:, H - p:, :, :].set(bot)
    lef = reflect_conv(unfold4_deconv(y4[:, :, :sc], ci))[:, :, :p]
    rig = reflect_conv(unfold4_deconv(y4[:, :, w4 - sc:], ci))[:, :, -p:]
    out = out.at[:, :, :p, :].set(lef)
    out = out.at[:, :, W - p:, :].set(rig)
    return out


@functools.lru_cache(maxsize=None)
def _fold4_head_reflect_maps(k: int):
    """fold-4 head maps for UNPADDED input with p=(k-1)//2 zero padding
    at cell level: image out m = 4t + 2e + d reads input i = m + r - p
    = 4(t + o - 1) + u with conv padding (1,1). Same output channel
    structure as _fold4_head_maps; borders are reflect-patched by the
    caller."""
    p = (k - 1) // 2
    kk = 3
    A = np.zeros((kk, kk, 4, 4, 2, 2, 2, 2), np.int32)
    B = np.zeros((kk, kk, 4, 4, 2, 2, 2, 2), np.int32)
    M = np.zeros((kk, kk, 4, 4, 2, 2, 2, 2), bool)
    for eh in (0, 1):
        for dh in (0, 1):
            for rh in range(k):
                th = 2 * eh + dh + rh - p
                oh, uh = th // 4 + 1, th % 4
                assert 0 <= oh < kk, (k, oh)
                for ew in (0, 1):
                    for dw in (0, 1):
                        for rw in range(k):
                            tw = 2 * ew + dw + rw - p
                            ow, uw = tw // 4 + 1, tw % 4
                            idx = (oh, ow, uh, uw, eh, ew, dh, dw)
                            A[idx] = rh
                            B[idx] = rw
                            M[idx] = True
    return A, B, M, kk


def head_fold4_reflect_in_act_s2d(x: jax.Array, w: jax.Array, b=None,
                                  act: str = "relu",
                                  precision=lax.Precision.HIGHEST,
                                  emit_d2s: bool = True) -> jax.Array:
    """c7s1 head (reflect pad p=(k-1)//2) + IN + act via a fold-4 conv,
    WITHOUT materializing the reflect-padded image (at 2048p that pad
    copy alone cost ~836 us). Zero-pad body on the folded input + exact
    reflect strips: the first/last fold-4 cell row/col are recomputed in
    image space from thin slices and patched into the pre-norm body, so
    the IN statistics see the exact conv result."""
    k, _, ci, co = w.shape
    p = (k - 1) // 2
    n, H, W, _ = x.shape
    assert H % 4 == 0 and W % 4 == 0, "fold-4 reflect head needs /4 sizes"
    h4, w4 = H // 4, W // 4
    xs4 = fold4_of_image(x)
    A, B, M, kk = _fold4_head_reflect_maps(k)
    wk = w[jnp.asarray(A), jnp.asarray(B)]
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    wk = wk.transpose(0, 1, 2, 3, 8, 4, 5, 6, 7, 9)
    wk = wk.reshape(kk, kk, 16 * ci, 16 * co).astype(x.dtype)
    body = quant.conv(
        xs4, wk, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )                                           # (n, h4, w4, 16co)

    # reflect-correct strips (first/last cell row/col): the zero-pad
    # error reaches p < 4 px into the frame, i.e. only the border cells
    def refold_rows(img_rows):
        """(n, 4, S, co) image rows -> (n, 1, S/4, 16co) cell row in the
        head's (e_h, e_w, d_h, d_w, co) channel order."""
        nn, four, S, c = img_rows.shape
        y = img_rows.reshape(nn, 2, 2, S // 4, 2, 2, c)
        y = y.transpose(0, 3, 1, 4, 2, 5, 6)    # (n, S/4, eh, ew, dh, dw, c)
        return y.reshape(nn, 1, S // 4, 16 * c)

    def conv_strip(sub):
        subp = jnp.pad(sub, ((0, 0), (p, p), (p, p), (0, 0)),
                       mode="reflect")
        return quant.conv(
            subp, w.astype(sub.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision)

    # 2 cell rows (8 px) of input cover the strip conv's interior reads
    top = conv_strip(x[:, :8, :, :])[:, :4]
    bot = conv_strip(x[:, H - 8:, :, :])[:, -4:]
    body = body.at[:, :1].set(refold_rows(top))
    body = body.at[:, h4 - 1:].set(refold_rows(bot))
    lef = conv_strip(x[:, :, :8, :])[:, :, :4]
    rig = conv_strip(x[:, :, W - 8:, :])[:, :, -4:]

    def refold_cols(img_cols):
        """(n, S, 4, co) image cols -> (n, S/4, 1, 16co) cell col."""
        nn, S, four, c = img_cols.shape
        y = img_cols.reshape(nn, S // 4, 2, 2, 2, 2, c)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6)    # (n,cell,eh,ew,dh,dw,c)
        return y.reshape(nn, S // 4, 1, 16 * c)

    t_row, b_row = refold_rows(top), refold_rows(bot)
    l_col, r_col = refold_cols(lef), refold_cols(rig)
    if b is not None:
        b16 = jnp.tile(b.astype(body.dtype), 16)
        body = body + b16
        t_row, b_row = t_row + b16, b_row + b16
        l_col, r_col = l_col + b16, r_col + b16
    if (os.environ.get("IR2RGB_HEAD_STATS", "patch") == "corrected"
            and h4 >= 3 and w4 >= 3):
        # Round-4 experiment: the patched body feeding BOTH the IN
        # stats reduce and the apply gave XLA two consumers of the
        # strip select, which it materialized in two layouts (2048p
        # profile: 612 us select_bitcast + a second 385 us stats pass).
        # Here the stats come from the UNPATCHED body (fusable into the
        # conv epilogue) corrected algebraically for the strip cells,
        # so the select's only consumer is the apply.
        body_p = body.at[:, :1].set(t_row).at[:, h4 - 1:].set(b_row)
        body_p = body_p.at[:, :, :1].set(l_col)
        body_p = body_p.at[:, :, w4 - 1:].set(r_col)
        body = _in_act_head_corrected(body, body_p, t_row, b_row,
                                      l_col, r_col, act)
    else:
        body = body.at[:, :1].set(t_row)
        body = body.at[:, h4 - 1:].set(b_row)
        body = body.at[:, :, :1].set(l_col)
        body = body.at[:, :, w4 - 1:].set(r_col)
        body = instance_norm_act_s2d(body, act, phases=16)
    if not emit_d2s:
        return body  # fold-4 rep, deconv channel order — for
        # conv_fold4_to_s2d consumers (the enhancer down1)
    return depth_to_space(body, 4 * co)


def _in_act_head_corrected(body, body_p, t_row, b_row, l_col, r_col,
                           act: str, eps: float = 1e-5) -> jax.Array:
    return _in_act_border_corrected(body, body_p, t_row, b_row,
                                    l_col, r_col, 1, act, 16, eps)


def _in_act_border_corrected(body, body_p, top, bot, lef, rig, ps: int,
                             act: str, phases: int,
                             eps: float = 1e-5) -> jax.Array:
    """Instance norm + act of a border-strip-PATCHED conv body, with the
    statistics computed from the unpatched ``body`` plus exact
    inclusion-exclusion corrections over the strip slices (the patched
    value of every border cell is known: row strips everywhere except
    the corner blocks, which the column strips overwrite). Same math as
    instance_norm_act_s2d(body_p, act, phases=phases) up to f32
    summation order; keeps the strip select single-consumer (the round-4
    fusion experiment — see head_fold4_reflect_in_act_s2d).

    ``top``/``bot`` are the patched first/last ``ps`` rows over the full
    width; ``lef``/``rig`` the first/last ``ps`` columns over the full
    height (column strips win the corners, matching the .at[].set order
    of conv_reflect_s2d and the fold-4 head)."""
    n, H, W, cp = body.shape
    c = cp // phases

    def sums(v):
        v32 = v.astype(jnp.float32)
        ax = tuple(range(1, v.ndim - 1))
        return jnp.sum(v32, ax), jnp.sum(v32 * v32, ax)

    s, ss = sums(body)
    # body border union: top/bot rows + left/right cols - corner blocks
    for sl in ((slice(0, ps),), (slice(H - ps, H),),
               (slice(None), slice(0, ps)),
               (slice(None), slice(W - ps, W))):
        ds, dss = sums(body[(slice(None),) + sl])
        s, ss = s - ds, ss - dss
    for hc in (slice(0, ps), slice(H - ps, H)):
        for wc in (slice(0, ps), slice(W - ps, W)):
            cs, css = sums(body[:, hc, wc])
            s, ss = s + cs, ss + css
    # patched border union: row strips minus their corner blocks, column
    # strips in full (they win the corners)
    for v in (top[:, :, ps:W - ps], bot[:, :, ps:W - ps], lef, rig):
        ds, dss = sums(v)
        s, ss = s + ds, ss + dss
    cnt = float(H * W * phases)
    mean_c = jnp.sum(s.reshape(n, phases, c), axis=1) / cnt
    ex2_c = jnp.sum(ss.reshape(n, phases, c), axis=1) / cnt
    var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
    mean = jnp.tile(mean_c, (1, phases))[:, None, None, :]
    rstd = jnp.tile(lax.rsqrt(var_c + eps), (1, phases))[:, None, None, :]
    y = (body_p.astype(jnp.float32) - mean) * rstd
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0.0, y, y * 0.2)
    elif act == "tanh":
        y = jnp.tanh(y)
    return y.astype(body_p.dtype)


def conv_reflect_in_act_s2d(xs: jax.Array, w: jax.Array, b=None,
                            act: str = "relu",
                            precision=lax.Precision.HIGHEST) -> jax.Array:
    """conv_reflect_s2d + instance norm + act with corrected-stats strip
    patching (round-4 fusion experiment, IR2RGB_BLOCK_STATS=corrected):
    the border-fixup select feeding BOTH the IN stats reduce and the
    apply made XLA materialize the patched tensor twice in two layouts
    at the 1024/2048 tiers (2048p profile: ~410 us relayout copies per
    res-block conv). Stats from the unpatched body + inclusion-exclusion
    over the strips leave the select a single consumer. Exact up to f32
    summation order vs conv_reflect_s2d -> instance_norm_act_s2d."""
    k = w.shape[0]
    pad = (k - 1) // 2
    n, hs, ws, _ = xs.shape
    ps = (pad + 1) // 2
    sl = ps + (pad + 1) // 2 + 1
    if hs <= 2 * sl or ws <= 2 * sl or hs < 3 * ps or ws < 3 * ps:
        y = conv_reflect_s2d(xs, w, precision=precision)
        if b is not None:
            y = y + jnp.tile(b.astype(y.dtype), 4)
        return instance_norm_act_s2d(y, act)

    if 4 * w.shape[3] <= 16:
        body = conv_on_s2d_wide(xs, w, pad, precision=precision)
    else:
        body = conv_on_s2d(xs, w, stride=1, pad=pad, precision=precision)

    def strip(sub):
        sp = reflect_pad_s2d(sub, pad)
        return conv_on_s2d(sp, w, stride=1, pad=0, precision=precision)

    top = strip(xs[:, :sl])[:, :ps]
    bot = strip(xs[:, hs - sl:])[:, -ps:]
    lef = strip(xs[:, :, :sl])[:, :, :ps]
    rig = strip(xs[:, :, ws - sl:])[:, :, -ps:]
    if b is not None:
        b4 = jnp.tile(b.astype(body.dtype), 4)
        body, top, bot = body + b4, top + b4, bot + b4
        lef, rig = lef + b4, rig + b4
    body_p = body.at[:, :ps].set(top).at[:, hs - ps:].set(bot)
    body_p = body_p.at[:, :, :ps].set(lef).at[:, :, ws - ps:].set(rig)
    return _in_act_border_corrected(body, body_p, top, bot, lef, rig,
                                    ps, act, 4)


@functools.lru_cache(maxsize=None)
def _fold4_to_s2d_maps(k: int, pad: int):
    """Maps for a stride-2 conv reading a fold-4 rep (deconv channel
    order (e_h,e_w,d_h,d_w,ci)) and emitting the s2d rep of the
    half-res result: out image m = 2j + d'; input i = 2m + r - pad =
    4(j + o) + u -> o = (2d'+r-pad)//4. For k=3/pad=1: o in {-1,0} —
    a 2-tap window with cell padding (1,0)."""
    omin = min((2 * d + r - pad) // 4 for d in (0, 1) for r in range(k))
    omax = max((2 * d + r - pad) // 4 for d in (0, 1) for r in range(k))
    kk = omax - omin + 1
    A = np.zeros((kk, kk, 16, 4), np.int32)   # (oh,ow, in-block, d'-phase)
    B = np.zeros((kk, kk, 16, 4), np.int32)
    M = np.zeros((kk, kk, 16, 4), bool)
    for dh in (0, 1):
        for rh in range(k):
            th = 2 * dh + rh - pad
            oh, uh = th // 4 - omin, th % 4
            for dw in (0, 1):
                for rw in range(k):
                    tw = 2 * dw + rw - pad
                    ow, uw = tw // 4 - omin, tw % 4
                    bid = (((uh // 2) * 2 + uw // 2) * 2
                           + uh % 2) * 2 + uw % 2
                    pidx = dh * 2 + dw
                    A[oh, ow, bid, pidx] = rh
                    B[oh, ow, bid, pidx] = rw
                    M[oh, ow, bid, pidx] = True
    return A, B, M, kk, omin


def conv_fold4_to_s2d(y4: jax.Array, w: jax.Array, pad: int = 1,
                      precision=lax.Precision.HIGHEST) -> jax.Array:
    """Stride-2 conv reading a fold-4 rep (deconv channel order) and
    emitting the s2d rep of the half-res result — the enhancer's down1
    without ever unfolding the head's output (the d2s between head and
    down1 cost ~650-750 us at 2048p). Same cell grid in and out: a
    2-tap-per-axis conv with K = 16ci on full lanes. Exact."""
    k, _, ci, co = w.shape
    A, B, M, kk, omin = _fold4_to_s2d_maps(k, pad)
    wk = w[jnp.asarray(A), jnp.asarray(B)]       # (kk,kk,16,4,ci,co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    wk = wk.transpose(0, 1, 2, 4, 3, 5)          # (kk,kk,16,ci,4,co)
    wk = wk.reshape(kk, kk, 16 * ci, 4 * co).astype(y4.dtype)
    lo = -omin
    hi = max(kk - 1 + omin, 0)
    return quant.conv(
        y4, wk, window_strides=(1, 1), padding=[(lo, hi), (lo, hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32 if y4.dtype == jnp.float32
        else None,
    )


def max_pool_2x2_s2d(xs: jax.Array) -> jax.Array:
    """MaxPool2d(2, stride=2) of the underlying image, given its s2d rep:
    the pool windows ARE the phase blocks, so this is an elementwise max
    over the four channel groups, emitting the plain rep at half res."""
    c = xs.shape[-1] // 4
    p0 = xs[..., 0 * c:1 * c]
    p1 = xs[..., 1 * c:2 * c]
    p2 = xs[..., 2 * c:3 * c]
    p3 = xs[..., 3 * c:4 * c]
    return jnp.maximum(jnp.maximum(p0, p1), jnp.maximum(p2, p3))


# ---------------------------------------------------------------------------
# s2d -> s2d subpixel transposed conv (k=3, s=2, p=1, op=1 family upsampler)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _deconv_s2d_maps(k: int, pad: int):
    """Gather maps for the quad-phase deconv kernel.

    Derivation: out[m] = sum_r w[r] x[(m+r-lo)/2] (lo = k-1-pad, even
    parity). With m = 2a+d and a = 2b+e (b on the input s2d grid), the tap
    is x at s2d phase q=(e+s)%2 and offset o=(e+s)//2 where s=(d+r-lo)/2 —
    so ONE unit-stride conv on the s2d grid produces all 16 (e_h,e_w,
    d_h,d_w) output phase channels; a depth-to-space over the e phases
    (C = 4*co, lane-aligned) then yields the s2d rep of the 2x-upsampled
    image with no plain-rep intermediate.
    Channel order: (e_h, e_w, d_h, d_w, co).
    """
    lo = k - 1 - pad
    taps = {}  # (e, d) -> [(q, o, r)]
    offs = []
    for e in (0, 1):
        for d in (0, 1):
            lst = []
            for r in range(k):
                if (d + r - lo) % 2:
                    continue
                s = (d + r - lo) // 2
                q = (e + s) % 2
                o = (e + s) // 2
                lst.append((q, o, r))
                offs.append(o)
            taps[(e, d)] = lst
    omin, omax = min(offs), max(offs)
    kk = omax - omin + 1
    A = np.zeros((kk, kk, 4, 16), np.int32)
    B = np.zeros((kk, kk, 4, 16), np.int32)
    M = np.zeros((kk, kk, 4, 16), bool)
    for eh in (0, 1):
        for ew in (0, 1):
            for dh in (0, 1):
                for dw in (0, 1):
                    pidx = ((eh * 2 + ew) * 2 + dh) * 2 + dw
                    for qh, oh, rh in taps[(eh, dh)]:
                        for qw, ow, rw in taps[(ew, dw)]:
                            qidx = qh * 2 + qw
                            A[oh - omin, ow - omin, qidx, pidx] = rh
                            B[oh - omin, ow - omin, qidx, pidx] = rw
                            M[oh - omin, ow - omin, qidx, pidx] = True
    return A, B, M, kk, omin


def _deconv_wk(w: jax.Array, k: int, pad: int) -> jax.Array:
    """w (k,k,ci,co) -> the quad-phase conv kernel (kk,kk,4ci,16co).
    Linear in w (gather + mask + transpose), so its linear_transpose is
    the exact dw-mapping back to kernel space."""
    ci, co = w.shape[2], w.shape[3]
    A, B, M, kk, _ = _deconv_s2d_maps(k, pad)
    wk = w[jnp.asarray(A), jnp.asarray(B)]             # (kk,kk,4,16,ci,co)
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    return wk.transpose(0, 1, 2, 4, 3, 5).reshape(kk, kk, 4 * ci, 16 * co)


def _deconv_conv(xs: jax.Array, wk: jax.Array, k: int, pad: int,
                 precision) -> jax.Array:
    _, _, _, kk, omin = _deconv_s2d_maps(k, pad)
    return quant.conv(
        xs, wk, window_strides=(1, 1),
        padding=[(-omin, kk - 1 + omin), (-omin, kk - 1 + omin)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32 if xs.dtype == jnp.float32
        else None,
    )


def deconv_s2d_to_s2d(xs: jax.Array, w: jax.Array, b=None,
                      k: int = 3, pad: int = 1,
                      precision=lax.Precision.HIGHEST) -> jax.Array:
    """Stride-2 transposed conv (output_padding=1, output = 2x input image)
    taking AND returning s2d reps. ``w`` is the canonical flipped-HWIO
    deconv kernel (k,k,ci,co); exact vs from_s2d -> subpixel deconv.

    NOTE(round 2): a custom VJP computing the filter gradient as kk*kk
    explicit window einsums (MXU matmuls instead of XLA's
    conv-backward-filter, which shows as five ~272 us dw fusions in the
    512p train profile) was built, gradient-exactness-tested, and
    measured: 43.6 ms/step vs 42.6-42.8 baseline — neutral-to-worse
    (the (4ci,S)x(S,16co) einsums pay their own relayouts). Reverted to
    plain autodiff; this docstring is the record.
    """
    co = w.shape[3]
    y = _deconv_conv(xs, _deconv_wk(w, k, pad), k, pad, precision)
    # d2s over the e phases: (n, hs, ws, 16co) -> (n, 2hs, 2ws, 4co),
    # which is the s2d rep of the (4hs, 4ws) output image
    y = depth_to_space(y, 4 * co)
    if b is not None:
        y = y + jnp.tile(b.astype(y.dtype), 4)
    return y


def deconv_in_act_s2d(xs: jax.Array, w: jax.Array, b=None,
                      act: str = "relu", k: int = 3, pad: int = 1,
                      precision=lax.Precision.HIGHEST,
                      emit_d2s: bool = True) -> jax.Array:
    """deconv_s2d_to_s2d + instance_norm_act_s2d with the norm applied
    on the PRE-d2s 16co-phase rep.

    Instance-norm statistics are phase-invariant (the d2s only permutes
    spatial positions within a channel), so normalizing before the
    interleave is the exact same math — and it halves the d2s transpose
    traffic: the round-3 2048p profile showed the deconv's internal
    depth-to-space materialized TWICE (~755 us each at 2048p — once
    feeding the IN-stats reduce, once fused into the IN-apply pass,
    s2d_conv.py depth_to_space + the convert at the IN tail). With the
    norm upstream the transpose runs once, after, into the consumer.
    Channel order pre-d2s is (e_h, e_w, d_h, d_w, co) — phase-major, so
    the stats fold is the same ``reshape(n, phases, co)`` with
    phases=16."""
    co = w.shape[3]
    if (os.environ.get("IR2RGB_DECONV_NORM", "pre") == "post"
            and emit_d2s):
        # A/B knob: norm after the d2s interleave (the round-2 lowering).
        # Only honored when the caller wants the post-d2s rep — with
        # emit_d2s=False the consumer (tail_from_fold4) structurally
        # needs the 16co-phase rep, so the pre-norm form (same math,
        # stats are phase-invariant) is used regardless of the knob.
        return instance_norm_act_s2d(
            deconv_s2d_to_s2d(xs, w, b, k, pad, precision), act)
    y = _deconv_conv(xs, _deconv_wk(w, k, pad), k, pad, precision)
    if b is not None:
        y = y + jnp.tile(b.astype(y.dtype), 16)
    y = instance_norm_act_s2d(y, act, phases=16)
    if not emit_d2s:
        return y  # pre-d2s fold-4 rep — tail_from_fold4 consumes this
    return depth_to_space(y, 4 * co)





# ---------------------------------------------------------------------------
# Reflection padding in s2d space
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _reflect_runs(h: int, pad: int):
    """For each output phase d: maximal runs of (source_phase, row_start,
    row_stop) realizing reflect-pad rows in s2d space."""
    hp = h + 2 * pad
    assert hp % 2 == 0
    out = []
    for d in (0, 1):
        rows = []
        for j in range(hp // 2):
            u = 2 * j + d - pad
            if u < 0:
                u = -u
            elif u > h - 1:
                u = 2 * (h - 1) - u
            rows.append((u % 2, u // 2))
        runs = []
        i = 0
        while i < len(rows):
            q0, r0 = rows[i]
            j = i + 1
            while (j < len(rows) and rows[j][0] == q0
                   and rows[j][1] == rows[j - 1][1] + 1):
                j += 1
            runs.append((q0, r0, rows[j - 1][1] + 1))
            i = j
        out.append(tuple(runs))
    return tuple(out)


def _compose(srcs, runs, axis: int) -> jax.Array:
    """concat of row/col slices: srcs[q] sliced per (q, start, stop) run."""
    pieces = []
    for q, r0, r1 in runs:
        sl = [slice(None)] * srcs[q].ndim
        sl[axis] = slice(r0, r1)
        pieces.append(srcs[q][tuple(sl)])
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces,
                                                              axis=axis)


def reflect_pad_s2d(xs: jax.Array, pad: int) -> jax.Array:
    """s2d rep of ReflectionPad2d(pad) applied to the underlying image.

    Pure channel-block slicing — the four phase blocks are channel slices
    and each output phase is a concat of row/col runs of the right source
    phase, so no 6-d phase-view intermediates (XLA assigned those layouts
    with the 2-wide phase dims on the lane axis, costing ~0.05 ms per
    reshape at 512px)."""
    n, hs, ws, c4 = xs.shape
    c = c4 // 4
    h_runs = _reflect_runs(hs * 2, pad)
    w_runs = _reflect_runs(ws * 2, pad)
    blocks = {(qh, qw): xs[..., (qh * 2 + qw) * c:(qh * 2 + qw + 1) * c]
              for qh in (0, 1) for qw in (0, 1)}
    out_blocks = []
    for dh in (0, 1):
        # rows pass per target h-phase, keeping qw separate
        rows = {qw: _compose({q: blocks[(q, qw)] for q in (0, 1)},
                             h_runs[dh], axis=1) for qw in (0, 1)}
        for dw in (0, 1):
            out_blocks.append(_compose(rows, w_runs[dw], axis=2))
    return jnp.concatenate(out_blocks, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_on_s2d_wide(xs: jax.Array, w: jax.Array, pad: int,
                     precision=lax.Precision.HIGHEST) -> jax.Array:
    """Zero-padded stride-1 s2d conv for OUTPUT-CHANNEL-STARVED kernels
    (the generators' c7s1-3 tails: P*co = 12 output channels).

    The direct conv lowering pays kk*kk MXU passes each padded to N=128
    lanes (measured 284 us at 512px for 5 GFLOPs — ~12/128 utilization).
    Here all kk*kk offset kernels run as ONE (M, 4C) x (4C, kk*kk*P*co)
    matmul (N=300 for the 7x7 tail — MXU-shaped), and the offset sum
    becomes kk*kk shifted channel-block slices of the padded product,
    which XLA fuses into a single accumulation pass.

    Custom VJP ("forward wide, backward direct"): autodiff through the
    pad + shifted-slice sum scatters the cotangent into a padded
    (h+4, w+4, kk*kk*P*co) buffer — the round-2 train profile's single
    most expensive op (637 us). Since this computes the same function
    as ``conv_on_s2d``, the backward instead linear-transposes the
    DIRECT conv formulation, which XLA lowers to ordinary transposed
    convs. Measured: step time neutral (42.6 -> 42.8 ms — the scatter
    goes away but the channel-starved transposed conv costs the same);
    kept for the bit-exact-vs-direct gradients and the ~40 MB smaller
    backward working set (no padded kk*kk*P*co cotangent buffer).
    """
    n, hs, ws, c4 = xs.shape
    ci = c4 // 4
    k, co = w.shape[0], w.shape[3]
    A, B, M, kk, omin, P = _conv_maps(k, pad, 1, True)
    wk = w[jnp.asarray(A), jnp.asarray(B)]
    wk = jnp.where(jnp.asarray(M)[..., None, None], wk, 0)
    wk = wk.transpose(0, 1, 2, 4, 3, 5).reshape(kk, kk, 4 * ci, P * co)
    lo = -omin

    def dim_plan(s):
        d_out = (s * 2 + 2 * pad - k) + 1
        assert d_out % 2 == 0
        j = (d_out + 1) // 2
        return j, max(j - 1 + kk - 1 - lo - (s - 1), 0)

    jh, hi_h = dim_plan(hs)
    jw, hi_w = dim_plan(ws)

    wide = wk.transpose(2, 0, 1, 3).reshape(4 * ci, kk * kk * P * co)
    y = quant.dot(xs, wide, (((3,), (0,)), ((), ())),
                        mixed_ch=(ci, co),
                        precision=precision,
                        preferred_element_type=jnp.float32 if
                        xs.dtype == jnp.float32 else None)
    y = jnp.pad(y, ((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)))
    blk = P * co
    out = None
    for th in range(kk):
        for tw in range(kk):
            t = th * kk + tw
            piece = y[:, th:th + jh, tw:tw + jw, t * blk:(t + 1) * blk]
            out = piece if out is None else out + piece
    return out


def _conv_wide_fwd(xs, w, pad, precision):
    return conv_on_s2d_wide(xs, w, pad, precision), (xs, w)


def _conv_wide_bwd(pad, precision, res, ct):
    xs, w = res
    dx = jax.linear_transpose(
        lambda v: conv_on_s2d(v, w, stride=1, pad=pad,
                              precision=precision), xs)(ct)[0]
    dw = jax.linear_transpose(
        lambda v: conv_on_s2d(xs, v, stride=1, pad=pad,
                              precision=precision), w)(ct)[0]
    return dx, dw


conv_on_s2d_wide.defvjp(_conv_wide_fwd, _conv_wide_bwd)


def conv_reflect_s2d(xs: jax.Array, w: jax.Array,
                     precision=lax.Precision.HIGHEST) -> jax.Array:
    """Reflect-padded k x k (odd k, pad=(k-1)/2) conv on the s2d rep —
    WITHOUT materializing the padded tensor.

    The round-2 profile showed reflect_pad_s2d costing ~320 us at 512px
    (it materializes a 259x259x128 intermediate; the zero-pad variant
    rides the conv op's own padding and saves that traffic — measured
    314 us on the v5e). Zero padding is only wrong within pad pixels of
    each image border, so the body runs zero-padded and four thin border
    strips are recomputed exactly (with true reflection, corners
    included) on small slices and patched in.
    """
    k = w.shape[0]
    pad = (k - 1) // 2
    n, hs, ws, _ = xs.shape
    ps = (pad + 1) // 2          # s2d rows/cols affected per border
    sl = ps + (pad + 1) // 2 + 1  # s2d rows of input per strip slice
    if hs <= 2 * sl or ws <= 2 * sl:
        # map too small for disjoint strips: materialized pad is cheap here
        return conv_on_s2d(reflect_pad_s2d(xs, pad), w, stride=1, pad=0,
                           precision=precision)

    if 4 * w.shape[3] <= 16:
        # output-channel-starved (the c7s1-3 tails): wide-matmul lowering
        y = conv_on_s2d_wide(xs, w, pad, precision=precision)
    else:
        y = conv_on_s2d(xs, w, stride=1, pad=pad, precision=precision)

    def strip(sub):
        sp = reflect_pad_s2d(sub, pad)
        return conv_on_s2d(sp, w, stride=1, pad=0, precision=precision)

    top = strip(xs[:, :sl])[:, :ps]
    bot = strip(xs[:, hs - sl:])[:, -ps:]
    left = strip(xs[:, :, :sl])[:, :, :ps]
    right = strip(xs[:, :, ws - sl:])[:, :, -ps:]
    y = y.at[:, :ps].set(top)
    y = y.at[:, hs - ps:].set(bot)
    y = y.at[:, :, :ps].set(left)
    y = y.at[:, :, ws - ps:].set(right)
    return y


# ---------------------------------------------------------------------------
# Instance norm (+ activation) in s2d space
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _in_stats_dot(xs: jax.Array):
    """(sum, sum-of-squares) per (n, channel) computed on the MXU: the
    spatial sum is a ones-row matmul and the square-sum is the diagonal
    of the Gram matrix X^T X — both fp32-accumulated. Exact for bf16
    inputs (bf16*bf16 products are representable, fp32 MXU
    accumulation); custom VJP gives the analytic backward (ct_s +
    2 x ct_ss, elementwise) instead of autodiff through the Gram
    diagonal.

    MEASURED AND NOT USED (opt-in via IR2RGB_IN_STATS=dot): in-context
    at 512px this LOSES to XLA's reduce fusions — 238.1 vs 283.8 fps
    local, 182.3 vs 198.0 global. The profile's 231/104/48-us "stats
    fusions" were already fused into the pad/copy producers (the
    activation write happened regardless), so standalone stats matmuls
    ADD full passes over the tensor instead of replacing anything.
    Kept as the documented record of the attempt, mirroring
    kernels/instance_norm.py and kernels/d2s.py."""
    n, hs, ws, c4 = xs.shape
    xf = xs.reshape(n, hs * ws, c4)
    prec = (lax.Precision.DEFAULT if xs.dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)
    ones = jnp.ones((hs * ws,), xs.dtype)
    s = jnp.einsum("s,nsc->nc", ones, xf, precision=prec,
                   preferred_element_type=jnp.float32)
    gram = jnp.einsum("nsc,nsd->ncd", xf, xf, precision=prec,
                      preferred_element_type=jnp.float32)
    ss = jnp.diagonal(gram, axis1=1, axis2=2)
    return s, ss


def _in_stats_dot_fwd(xs):
    return _in_stats_dot(xs), xs


def _in_stats_dot_bwd(xs, ct):
    ct_s, ct_ss = ct
    g = (ct_s[:, None, None, :]
         + 2.0 * xs.astype(jnp.float32) * ct_ss[:, None, None, :])
    return (g.astype(xs.dtype),)


_in_stats_dot.defvjp(_in_stats_dot_fwd, _in_stats_dot_bwd)


def instance_norm_act_s2d(xs: jax.Array, act: str = "relu",
                          eps: float = 1e-5,
                          negative_slope: float = 0.2,
                          phases: int = 4) -> jax.Array:
    """Exact image-space instance norm on the s2d rep: fp32 statistics per
    original channel, reduced over space and the ``phases`` phase blocks
    (4 for the standard s2d rep; 16 for the quad-phase deconv's pre-d2s
    rep — see deconv_in_act_s2d).

    The phase fold happens on the (n, phases*C) stats vector, not on the
    big tensor (a 6-d phase view of the activation costs a materialized
    relayout on TPU)."""
    n, hs, ws, c4 = xs.shape
    c = c4 // phases
    x32 = xs.astype(jnp.float32)
    if (phases == 4 and jax.default_backend() == "tpu" and c4 <= 512
            and os.environ.get("IR2RGB_IN_STATS", "xla") == "dot"):
        s, ss = _in_stats_dot(xs)
    else:
        s = jnp.sum(x32, axis=(1, 2))            # (n, phases*C)
        ss = jnp.sum(x32 * x32, axis=(1, 2))
    cnt = float(hs * ws * phases)
    mean_c = jnp.sum(s.reshape(n, phases, c), axis=1) / cnt  # (n, C)
    ex2_c = jnp.sum(ss.reshape(n, phases, c), axis=1) / cnt
    var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
    mean = jnp.tile(mean_c, (1, phases))[:, None, None, :]
    rstd = jnp.tile(lax.rsqrt(var_c + eps), (1, phases))[:, None, None, :]
    if xs.dtype != jnp.float32 and \
            os.environ.get("IR2RGB_IN_ELT", "f32") == "input":
        # Experimental: stats stay fp32 (above) but the normalize
        # multiply runs in the input dtype. At batch 2-4 XLA rewrites
        # the convs spatially-split and the fp32 normalize forces
        # ~0.4 ms/conv layout copies of the split fp32 tensors
        # (profiled, round 3); bf16 elementwise avoids materializing
        # them. Off by default pending a measured win at batch 1.
        y = (xs - mean.astype(xs.dtype)) * rstd.astype(xs.dtype)
        zero = jnp.zeros((), xs.dtype)
        if act == "relu":
            y = jnp.maximum(y, zero)
        elif act == "leaky_relu":
            y = jnp.where(y >= zero, y, y * jnp.asarray(negative_slope,
                                                        xs.dtype))
        elif act == "tanh":
            y = jnp.tanh(y)
        return y
    y = (x32 - mean) * rstd
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0.0, y, y * negative_slope)
    elif act == "tanh":
        y = jnp.tanh(y)
    return y.astype(xs.dtype)
