"""Core functional NN ops — NHWC, TPU-native layouts.

This is the L1 layer of the rebuild (reference: ``models/networks.py``,
SURVEY.md §2.1), built as pure functions over parameter pytrees instead of
``torch.nn`` modules:

- every layer is an ``init(key, ...) -> params`` / ``apply(params, x, ...)``
  pair; params are plain nested dicts of ``jnp.ndarray``;
- layouts are TPU-native: activations NHWC, conv kernels HWIO (XLA's
  preferred layouts for the MXU) — the torch-checkpoint importer transposes
  from torch's NCHW/OIHW (see ``ir2rgb_tpu/checkpoint/torch_import.py``);
- transposed convolution is expressed as an lhs-dilated forward conv with a
  spatially pre-flipped kernel (exact integer-parity with
  ``torch.nn.ConvTranspose2d`` — verified with integer-valued kernels);
- instance norm keeps fp32 statistics regardless of compute dtype
  (mandatory for the >=40 dB parity bar, SURVEY.md §7 "hard parts" #1);
- the instance-norm+activation hot path dispatches to a fused Pallas TPU
  kernel when enabled (``ir2rgb_tpu/kernels``).

Initialization matches the reference family's ``weights_init``:
conv/deconv weights ~ N(0, 0.02), norm gamma ~ N(1, 0.02), beta = 0.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ir2rgb_tpu.nn import quant

Params = Dict[str, Any]

INIT_STD = 0.02  # reference weights_init: N(0, 0.02)
INSTANCE_NORM_EPS = 1e-5  # torch InstanceNorm2d default
BATCH_NORM_EPS = 1e-5


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def apply_init_type(params: Params, key: jax.Array, init_type: str,
                    gain: float = INIT_STD,
                    deconv_parents: Tuple[str, ...] = ()) -> Params:
    """Re-draw every conv/deconv kernel per the family's ``--init_type``
    (normal | xavier | kaiming | orthogonal).

    Mirrors the reference's two-phase pattern — modules are built, then
    ``net.apply(init_func)`` rewrites the weights — so the per-layer
    init code stays N(0, 0.02) and this is a pure tree transformation.
    Biases, norm gammas/betas, and non-4D leaves are untouched (the
    reference's init_func only re-draws ``Conv``-classed weights; its
    norm/bias handling matches the defaults already in place).

    ``deconv_parents``: kernels whose parent dict key is in this tuple
    are transposed convolutions. torch computes their fans from the
    ConvTranspose2d weight layout (cin, cout, k, k) — fan_in = cout*k*k,
    orthogonal rows indexed by cin — i.e. exactly the fans of a forward
    conv with I and O swapped, so those leaves are re-drawn for the
    swapped shape and transposed back (kaiming std and the orthogonal
    row space then match the reference's init_func on every up layer;
    xavier is I/O-symmetric and unaffected)."""
    if init_type == "normal":
        return params
    if init_type not in ("xavier", "kaiming", "orthogonal"):
        raise ValueError(f"unknown init_type: {init_type}")

    def redraw(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.ndim != 4 or name != "w":
            return leaf
        parent = (path[-2].key if len(path) > 1
                  and hasattr(path[-2], "key") else "")
        is_deconv = parent in deconv_parents
        # stable per-leaf key: fold the path string into the base key
        # (crc32, NOT Python hash() — that is salted per process, which
        # would diverge multihost replicas at init)
        import zlib
        k = key
        for p in path:
            s = p.key if hasattr(p, "key") else str(p)
            k = jax.random.fold_in(k, zlib.crc32(s.encode()) & 0x7FFFFFFF)
        # draw in the I/O-swapped frame for deconvs, transpose back after
        shape = ((leaf.shape[0], leaf.shape[1], leaf.shape[3],
                  leaf.shape[2]) if is_deconv else leaf.shape)
        kh, kw, cin, cout = shape
        fan_in, fan_out = kh * kw * cin, kh * kw * cout

        def back(w):
            return jnp.swapaxes(w, 2, 3) if is_deconv else w

        if init_type == "xavier":
            std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
            return back(jax.random.normal(k, shape, leaf.dtype) * std)
        if init_type == "kaiming":
            std = (2.0 / fan_in) ** 0.5  # a=0, fan_in (reference args)
            return back(jax.random.normal(k, shape, leaf.dtype) * std)
        # orthogonal: torch flattens to (cout, fan_in); the smaller
        # dimension's vectors are orthonormal (QR of the tall matrix,
        # sign-fixed for the unique uniform-Haar Q)
        a = jax.random.normal(k, (max(cout, fan_in), min(cout, fan_in)),
                              jnp.float32)
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))
        mat = q if cout >= fan_in else q.T  # (cout, fan_in)
        w = mat.reshape(cout, kh, kw, cin).transpose(1, 2, 3, 0)
        return back((w * gain).astype(leaf.dtype))

    return jax.tree_util.tree_map_with_path(redraw, params)


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

def conv_init(key: jax.Array, cin: int, cout: int, k: int,
              use_bias: bool = True, dtype=jnp.float32) -> Params:
    """3x3/4x4/7x7 conv params. Kernel HWIO, weights ~ N(0, 0.02)."""
    wkey, _ = jax.random.split(key)
    p = {"w": jax.random.normal(wkey, (k, k, cin, cout), dtype) * INIT_STD}
    if use_bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _use_s2d(x: jax.Array, w: jax.Array, stride: int, padding) -> bool:
    """Route channel-starved high-resolution convs through the exact
    space-to-depth lowering (ir2rgb_tpu/nn/s2d_conv.py): below ~128
    channels the direct conv leaves the MXU's 128-wide tiles mostly idle
    (measured 1-8% utilization on the generators' full-res layers)."""
    if stride not in (1, 2):
        return False
    if not (isinstance(padding, int) or padding == "VALID"):
        return False
    h, wd = x.shape[1], x.shape[2]
    ci, co = w.shape[2], w.shape[3]
    return h >= 128 and wd >= 128 and min(ci, co) <= 64


def conv_apply(p: Params, x: jax.Array, stride: int = 1,
               padding="VALID", compute_dtype=None) -> jax.Array:
    """NHWC conv (cross-correlation, matching torch.nn.Conv2d)."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if _use_s2d(x, w, stride, padding):
        from .s2d_conv import conv_s2d
        y = conv_s2d(x, w, stride, 0 if padding == "VALID" else padding)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # HIGHEST: true-f32 conv for f32 inputs (default XLA precision decomposes
    # to bf16 passes and costs ~5e-3 parity error); bf16 inputs still take
    # the native MXU bf16 path.
    y = quant.conv(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Transposed convolution (torch ConvTranspose2d parity)
# ---------------------------------------------------------------------------
#
# torch ConvTranspose2d(cin, cout, k, stride=s, padding=p, output_padding=op)
# == forward conv over the lhs-dilated input with the spatially-flipped
#    kernel and padding (k-1-p, k-1-p+op) per spatial dim.
# We store the kernel ALREADY in forward-conv orientation (HWIO, I=cin,
# O=cout, spatial flip folded in at init/import time) so apply is a single
# conv_general_dilated — XLA lowers this straight onto the MXU.

def deconv_init(key: jax.Array, cin: int, cout: int, k: int,
                use_bias: bool = True, dtype=jnp.float32) -> Params:
    wkey, _ = jax.random.split(key)
    # N(0, 0.02) is flip-invariant; no orientation concern at init.
    p = {"w": jax.random.normal(wkey, (k, k, cin, cout), dtype) * INIT_STD}
    if use_bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _subpixel_plan(k: int, pad: int):
    """Phase decomposition of a stride-2 transposed conv.

    Output position m = 2i+d (phase d) sums w[r]·x[i + (d+r-lo)/2] over the
    kernel rows r with (d+r-lo) even (lo = k-1-pad). Collecting the four
    (d_h, d_w) phases into one dense conv kernel of window kk (the union of
    needed input taps, zero-padded) with 4·cout output channels followed by
    depth-to-space gives the EXACT same op — but as a plain strided conv
    that XLA lowers onto the MXU directly, instead of an lhs-dilated conv
    (which lowers poorly on TPU: measured ~0.4-1.0 ms/frame faster
    end-to-end on the 512px generators).
    Returns (per-phase (rows, offsets), kk, omin).
    """
    lo = k - 1 - pad
    phases = []
    offs = []
    for d in (0, 1):
        rs = [r for r in range(k) if (d + r - lo) % 2 == 0]
        os_ = [(d + r - lo) // 2 for r in rs]
        phases.append((rs, os_))
        offs += os_
    omin, omax = min(offs), max(offs)
    return phases, omax - omin + 1, omin


def _subpixel_kernel(w: jax.Array, k: int, pad: int):
    """Rearrange the canonical (k,k,ci,co) deconv kernel into the dense
    (kk,kk,ci,4*co) subpixel conv kernel (pure gather/scatter of weights —
    a few microseconds per step, traced once)."""
    ci, co = w.shape[2], w.shape[3]
    phases, kk, omin = _subpixel_plan(k, pad)
    wk = jnp.zeros((kk, kk, ci, 4 * co), w.dtype)
    for dh in (0, 1):
        rh, oh = phases[dh]
        for dw_ in (0, 1):
            rw, ow = phases[dw_]
            pidx = dh * 2 + dw_
            for a, oa in zip(rh, oh):
                for b, ob in zip(rw, ow):
                    wk = wk.at[oa - omin, ob - omin, :,
                               pidx * co:(pidx + 1) * co].set(w[a, b])
    return wk, kk, omin


def deconv_apply(p: Params, x: jax.Array, stride: int = 2, k: int = 3,
                 pad: int = 1, output_padding: int = 1,
                 compute_dtype=None, lowering: str = "subpixel") -> jax.Array:
    """Transposed conv. Defaults (k=3,s=2,p=1,op=1) double spatial dims,
    matching the reference generators' upsampling layers.

    lowering='subpixel' (default): dense conv + depth-to-space, exact and
    MXU-native. lowering='dilated': the direct lhs-dilated formulation
    (reference semantics spelled literally; slower on TPU).
    """
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pref = jnp.float32 if x.dtype == jnp.float32 else None
    # The subpixel form emits exactly (2h, 2w) and can only trim down,
    # never extend — geometries whose torch output exceeds 2*dim (e.g.
    # k=4, pad=1, output_padding=1 -> 2h+1) must take the dilated path.
    if (lowering == "subpixel" and stride == 2
            and output_padding in (0, 1)
            and k + output_padding - 2 * pad <= 2):
        n, h, wd, ci = x.shape
        co = w.shape[3]
        wk, kk, omin = _subpixel_kernel(w, k, pad)
        y = quant.conv(
            x, wk, window_strides=(1, 1),
            padding=[(-omin, kk - 1 + omin), (-omin, kk - 1 + omin)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=pref,
        )
        y = y.reshape(n, h, wd, 2, 2, co)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, co)
        # torch output size per dim: (dim-1)*2 - 2*pad + k + op; trim
        # each spatial dim independently (non-square inputs)
        out_h = (h - 1) * 2 - 2 * pad + k + output_padding
        out_w = (wd - 1) * 2 - 2 * pad + k + output_padding
        if out_h != 2 * h or out_w != 2 * wd:
            y = y[:, :out_h, :out_w, :]
    else:
        lo = k - 1 - pad
        hi = k - 1 - pad + output_padding
        y = quant.conv(
            x, w, window_strides=(1, 1), padding=[(lo, hi), (lo, hi)],
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=pref,
        )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def deconv_apply_s2d_out(p: Params, x: jax.Array, k: int = 3, pad: int = 1,
                         compute_dtype=None) -> jax.Array:
    """Subpixel transposed conv that KEEPS the phase channels: returns the
    s2d representation of the 2x-upsampled output directly (the subpixel
    conv's (n,h,w,4co) intermediate IS the s2d rep — phase order matches
    s2d_space). Only for output_padding=1 with k=3 / output size 2h."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    wk, kk, omin = _subpixel_kernel(w, k, pad)
    y = quant.conv(
        x, wk, window_strides=(1, 1),
        padding=[(-omin, kk - 1 + omin), (-omin, kk - 1 + omin)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32
        else None,
    )
    if "b" in p:
        co = w.shape[3]
        y = y + jnp.tile(p["b"].astype(y.dtype), 4)
    return y


def norm_init(key: jax.Array, norm: str, c: int, dtype=jnp.float32) -> Params:
    """Norm params. Reference: InstanceNorm2d(affine=False) -> no params;
    BatchNorm2d -> gamma ~ N(1, 0.02), beta = 0 (weights_init)."""
    if norm in ("instance", "none"):
        return {}
    if norm == "batch":
        return {
            "gamma": 1.0 + jax.random.normal(key, (c,), dtype) * INIT_STD,
            "beta": jnp.zeros((c,), dtype),
        }
    raise ValueError(f"unknown norm: {norm}")


def instance_norm(x: jax.Array, eps: float = INSTANCE_NORM_EPS) -> jax.Array:
    """Per-(N, C) normalization over (H, W). fp32 statistics always.

    IR2RGB_IN_ELT=input keeps the normalize multiply in the input dtype
    (stats still fp32) — see s2d_space.instance_norm_act_s2d for the
    batch-2..7 spatially-split-conv layout-copy rationale."""
    import os
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    if x.dtype != jnp.float32 and \
            os.environ.get("IR2RGB_IN_ELT", "f32") == "input":
        return (x - mean.astype(x.dtype)) * \
            lax.rsqrt(var + eps).astype(x.dtype)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def batch_norm(p: Params, x: jax.Array,
               eps: float = BATCH_NORM_EPS,
               use_running_stats: bool = False) -> jax.Array:
    """Batch norm over (N, H, W), fp32 stats.

    Uses batch statistics by default — faithful to the pix2pix family's
    test-time behavior (the reference family evaluates batch-norm nets with
    batch statistics; at batch size 1 this degenerates to instance norm).
    If a torch checkpoint supplied running stats, pass
    ``use_running_stats=True`` to reproduce ``model.eval()`` semantics.
    """
    x32 = x.astype(jnp.float32)
    if use_running_stats and "running_mean" in p:
        mean = p["running_mean"].astype(jnp.float32)
        var = p["running_var"].astype(jnp.float32)
    else:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * p["gamma"].astype(jnp.float32) + p["beta"].astype(jnp.float32)
    return y.astype(x.dtype)


def apply_norm(p: Params, x: jax.Array, norm: str,
               use_running_stats: bool = False) -> jax.Array:
    if norm == "instance":
        return instance_norm(x)
    if norm == "batch":
        return batch_norm(p, x, use_running_stats=use_running_stats)
    if norm == "none":
        return x
    raise ValueError(f"unknown norm: {norm}")


def norm_act(p: Params, x: jax.Array, norm: str, act: str = "relu",
             use_running_stats: bool = False,
             negative_slope: float = 0.2) -> jax.Array:
    """Norm followed by activation — the generator hot pattern.

    For instance norm this routes through the fused Pallas kernel on TPU
    (BASELINE.json:5 "Pallas-fused instance-norm+activation").
    """
    if norm == "instance":
        from ir2rgb_tpu.kernels import fused_instance_norm_act
        return fused_instance_norm_act(x, act=act,
                                       negative_slope=negative_slope)
    y = apply_norm(p, x, norm, use_running_stats=use_running_stats)
    return apply_act(y, act, negative_slope)


def apply_act(x: jax.Array, act: str, negative_slope: float = 0.2) -> jax.Array:
    if act == "relu":
        return jax.nn.relu(x)
    if act == "leaky_relu":
        return jax.nn.leaky_relu(x, negative_slope)
    if act == "tanh":
        return jnp.tanh(x)
    if act == "none":
        return x
    raise ValueError(f"unknown act: {act}")


# ---------------------------------------------------------------------------
# Padding / pooling / resizing
# ---------------------------------------------------------------------------

def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """torch ReflectionPad2d parity (NHWC)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def replicate_pad(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def avg_pool(x: jax.Array, window: int = 3, stride: int = 2,
             pad: int = 1, count_include_pad: bool = False) -> jax.Array:
    """torch AvgPool2d parity (count_include_pad=False by default — the
    multiscale-discriminator pyramid downsampler)."""
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    x32 = x.astype(jnp.float32)
    s = lax.reduce_window(x32, 0.0, lax.add, dims, strides, padding)
    if count_include_pad:
        cnt = float(window * window)
        y = s / cnt
    else:
        ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
        cnt = lax.reduce_window(ones, 0.0, lax.add, dims, strides, padding)
        y = s / cnt
    return y.astype(x.dtype)


def resize_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor upsample by integer factor (torch Upsample parity)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def resize_bilinear(x: jax.Array, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jax.Array:
    """Bilinear resize. align_corners=False matches torch's default
    (half-pixel centers), which is also jax.image.resize('linear')."""
    n, h, w, c = x.shape
    if align_corners:
        # torch align_corners=True: endpoints map to endpoints
        oh, ow = out_hw
        hs = jnp.linspace(0, h - 1, oh)
        ws = jnp.linspace(0, w - 1, ow)
        h0 = jnp.floor(hs).astype(jnp.int32)
        w0 = jnp.floor(ws).astype(jnp.int32)
        h1 = jnp.clip(h0 + 1, 0, h - 1)
        w1 = jnp.clip(w0 + 1, 0, w - 1)
        th = (hs - h0)[None, :, None, None]
        tw = (ws - w0)[None, None, :, None]
        a = x[:, h0][:, :, w0]
        b = x[:, h0][:, :, w1]
        cc = x[:, h1][:, :, w0]
        d = x[:, h1][:, :, w1]
        top = a * (1 - tw) + b * tw
        bot = cc * (1 - tw) + d * tw
        return (top * (1 - th) + bot * th).astype(x.dtype)
    return jax.image.resize(x, (n,) + tuple(out_hw) + (c,), method="linear")


def dropout(key: jax.Array, x: jax.Array, rate: float = 0.5) -> jax.Array:
    """Inverted dropout (torch parity in expectation); used by U-Net inner
    blocks during training."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
