"""Generator zoo — pure-functional, NHWC.

Rebuilds the reference generator family (``models/networks.py`` —
SURVEY.md §2.1: ``define_G`` variants):

- ``resnet_9blocks`` / ``resnet_6blocks``: c7s1-64, two stride-2 downs,
  N residual blocks, two transposed-conv ups, c7s1-3 + tanh
  (BASELINE.json:7 config).
- ``unet_256`` / ``unet_128``: 8/7-level U-Net with skip concats
  (BASELINE.json:8 config).
- ``global``: pix2pixHD coarse generator — c7s1-ngf, 4 stride-2 downs,
  9 res blocks, 4 ups (BASELINE.json:9).
- ``local``: pix2pixHD coarse-to-fine — global trunk at half resolution
  (output head stripped) + local enhancer branch joined by elementwise sum.

Conventions (see ops.py): params are nested dicts; conv kernels HWIO;
``use_bias`` follows the family rule (bias iff the following norm has no
affine rescale, i.e. instance/none); weights ~ N(0, 0.02).

Residual-block structure per the family spec: ReflectionPad1 + 3x3 conv +
norm + ReLU + ReflectionPad1 + 3x3 conv + norm, additive skip.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from . import ops
from .ops import Params


@dataclasses.dataclass(frozen=True)
class GenConfig:
    """Static generator hyperparameters (hashable, jit-closable)."""

    net_g: str = "resnet_9blocks"
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    norm: str = "instance"
    upsample: str = "deconv"  # deconv | resize_conv
    use_dropout: bool = False
    # pix2pixHD knobs
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_blocks_local: int = 3
    n_local_enhancers: int = 1
    compute_dtype: Any = jnp.float32
    # jax.checkpoint the residual blocks (backward recompute, saves HBM)
    remat: bool = False


def _use_bias(norm: str) -> bool:
    # Conv bias is redundant directly before an affine batch norm.
    return norm != "batch"


# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------

def _conv_norm_init(key, cin, cout, k, norm, use_bias):
    k1, k2 = jax.random.split(key)
    return {"conv": ops.conv_init(k1, cin, cout, k, use_bias=use_bias),
            "norm": ops.norm_init(k2, norm, cout)}


def _resnet_block_init(key, c, norm, use_bias):
    k1, k2 = jax.random.split(key)
    return {"conv0": _conv_norm_init(k1, c, c, 3, norm, use_bias),
            "conv1": _conv_norm_init(k2, c, c, 3, norm, use_bias)}


def _resnet_block_apply(p, x, cfg: GenConfig, *, train=False, rng=None):
    if cfg.remat:
        fn = jax.checkpoint(
            lambda p_, x_: _resnet_block_body(p_, x_, cfg, train=train,
                                              rng=rng))
        return fn(p, x)
    return _resnet_block_body(p, x, cfg, train=train, rng=rng)


def _resnet_block_body(p, x, cfg: GenConfig, *, train=False, rng=None):
    h = ops.reflect_pad(x, 1)
    h = ops.conv_apply(p["conv0"]["conv"], h, compute_dtype=cfg.compute_dtype)
    h = ops.norm_act(p["conv0"].get("norm", {}), h, cfg.norm, "relu")
    if cfg.use_dropout and train and rng is not None:
        h = ops.dropout(rng, h, 0.5)
    h = ops.reflect_pad(h, 1)
    h = ops.conv_apply(p["conv1"]["conv"], h, compute_dtype=cfg.compute_dtype)
    h = ops.norm_act(p["conv1"].get("norm", {}), h, cfg.norm, "none")
    return x + h


def _up_init(key, cin, cout, cfg: GenConfig, use_bias):
    k1, k2 = jax.random.split(key)
    if cfg.upsample == "deconv":
        up = ops.deconv_init(k1, cin, cout, 3, use_bias=use_bias)
    else:  # resize_conv: nearest x2 + 3x3 conv (no checkerboard artifacts)
        up = ops.conv_init(k1, cin, cout, 3, use_bias=use_bias)
    return {"up": up, "norm": ops.norm_init(k2, cfg.norm, cout)}


def _up_apply(p, x, cfg: GenConfig, act="relu"):
    if cfg.upsample == "deconv":
        h = ops.deconv_apply(p["up"], x, stride=2, k=3, pad=1,
                             output_padding=1, compute_dtype=cfg.compute_dtype)
    else:
        h = ops.resize_nearest(x, 2)
        h = ops.conv_apply(p["up"], h, padding=1,
                           compute_dtype=cfg.compute_dtype)
    return ops.norm_act(p.get("norm", {}), h, cfg.norm, act)


def _up_phase_mode() -> str:
    """Lowering for the mid-stack (plain-rep, >64ch) upsamplers inside
    the s2d generators: 'phase' emits the subpixel deconv's 4co phase
    rep, runs IN+relu on it (phase-grouped fp32 stats — exactly the
    image-space statistics), and interleaves ONCE on the normalized
    output, instead of deconv->d2s->IN which materializes the
    interleaved tensor for the stats reduce and again for the apply
    (round-4 global-512 profile: the three mid-up d2s transposes +
    relayout copies were ~370 us of the 0.73 ms formatting bucket).
    IR2RGB_UP=plain|phase|phase_dot; phase_dot additionally lowers the
    final interleave as selection matmuls (_d2s_dot) instead of the
    reshape-transpose. Measured on-chip (round 4, global-512
    median-of-5): plain 199.7 / phase 205.6 / phase_dot 210.9 fps —
    phase_dot is the default."""
    if jax.default_backend() != "tpu":
        return "plain"
    return os.environ.get("IR2RGB_UP", "phase_dot")


def _up_apply_phase(p, x, cfg: GenConfig, mode: str, act="relu"):
    """Phase-rep mid upsampler (see _up_phase_mode). Exact: normalize
    and interleave commute elementwise; tested vs _up_apply in
    tests/test_s2d_space.py."""
    from .s2d_space import from_s2d, instance_norm_act_s2d, _d2s_dot_any
    ph = ops.deconv_apply_s2d_out(p["up"], x, k=3, pad=1,
                                  compute_dtype=cfg.compute_dtype)
    ph = instance_norm_act_s2d(ph, act)
    co = p["up"]["w"].shape[3]
    return _d2s_dot_any(ph, co) if mode == "phase_dot" else from_s2d(ph, co)


# ---------------------------------------------------------------------------
# Persistent-s2d high-resolution region (see nn/s2d_space.py)
# ---------------------------------------------------------------------------
#
# The full-res layers (head/tail/outer downs/ups/enhancer blocks) run on the
# s2d representation end-to-end: channel-starved convs become MXU-shaped
# and the layout copies that dominated the 512px profile disappear. Every
# transform is exact, so checkpoint parity is unaffected.

_S2D_MIN_RES = 256      # enter s2d only for large inputs
_S2D_MAX_CH = 64        # layers with <= this many image channels stay s2d


def _gen_use_s2d(cfg: GenConfig, x: jax.Array) -> bool:
    return (cfg.norm == "instance" and cfg.upsample == "deconv"
            and x.ndim == 4 and x.shape[1] >= _S2D_MIN_RES
            and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)


def _conv_s2d_wrap(pc, hs, cfg: GenConfig, *, k, pad=0, stride=1,
                   out_s2d=True):
    from .s2d_space import conv_on_s2d
    w = pc["w"].astype(cfg.compute_dtype)
    y = conv_on_s2d(hs.astype(cfg.compute_dtype), w, stride=stride, pad=pad,
                    out_s2d=out_s2d)
    if "b" in pc:
        b = pc["b"].astype(y.dtype)
        y = y + (jnp.tile(b, 4) if out_s2d else b)
    return y


def _s2d_tail_output(pc, hs, cfg: GenConfig, train: bool) -> jax.Array:
    """Generator tail from the s2d rep: reflect-pad 3 + c7s1-out + tanh
    + from_s2d.

    A fused Pallas kernel for this whole region exists
    (kernels/tail_fused.py) and beats the XLA composition ~2x measured
    STANDALONE (1039 -> 550 us/iter on the v5e) — but enabling it inside
    the full generator REGRESSES the frame 4.33 -> 7.0 ms: the custom
    call pins its operand to the default layout and XLA's layout
    assignment propagates that backward, retiling every upstream conv
    (conv time 1.83 -> 4.56 ms; T(8,128) tiles degrade to T(2,128)).
    Layout constraints, optimization barriers, and rank changes at the
    boundary do not stop the propagation (all measured; see
    docs/DESIGN.md §4). Production default is therefore the XLA path;
    the kernel is opt-in via IR2RGB_ENABLE_TAIL_KERNEL=1 for inference.
    """
    from .s2d_space import from_s2d
    from ir2rgb_tpu.kernels.tail_fused import (
        tail_fused,
        tail_fused_supported,
    )
    w = pc["w"]
    if (not train and jax.default_backend() == "tpu"
            and os.environ.get("IR2RGB_ENABLE_TAIL_KERNEL", "0") == "1"
            and tail_fused_supported(hs.shape, w.shape)):
        b = pc.get("b", jnp.zeros((w.shape[3],), jnp.float32))
        return tail_fused(hs.astype(cfg.compute_dtype),
                          w.astype(cfg.compute_dtype), b)
    from .s2d_space import _fold_prec, conv_reflect_s2d
    prec = _fold_prec(cfg.compute_dtype)
    y = conv_reflect_s2d(hs.astype(cfg.compute_dtype),
                         w.astype(cfg.compute_dtype), precision=prec)
    if "b" in pc:
        y = y + jnp.tile(pc["b"].astype(y.dtype), 4)
    y = jnp.tanh(y.astype(jnp.float32)).astype(cfg.compute_dtype)
    return from_s2d(y, cfg.output_nc)


def _head_conv_s2d(pc, x, cfg: GenConfig):
    """c7s1 head: reflect-pad in image space, fused image->s2d conv (the
    input is read exactly once, no s2d intermediate)."""
    from .s2d_space import conv_image_to_s2d
    xp = ops.reflect_pad(x.astype(cfg.compute_dtype), 3)
    y = conv_image_to_s2d(xp, pc["w"].astype(cfg.compute_dtype))
    if "b" in pc:
        y = y + jnp.tile(pc["b"].astype(y.dtype), 4)
    return y


def _head_in_act_s2d(pc, x, cfg: GenConfig):
    """reflect-pad + c7s1 head + instance norm + relu, dispatched.

    On TPU, heads whose output is >= 1024 px use the round-3 fold-4
    lowering (s2d_space.head_fold4_in_act_s2d): the direct head iterates
    k*k taps at K=3 per MXU pass and was the largest single op of the
    1024/2048 profiles; folding the padded image 4x4 cuts it to
    (k+2)//4+1 squared taps of K=48 with the norm on the pre-d2s phase
    rep. Standalone segment times on the v5e (exp_head_conv.py):
    2048/ngf16 7583->3488, 1024/ngf32 1901->1130, 512/ngf64 624->339 us
    — but IN CONTEXT the <= 512 px heads REGRESS the full generators
    (512p local 287->270, global 201->184, temporal 293->253 fps; the
    same layout-retile effect as the im2col and Pallas-tail attempts),
    while the 2048p frame drops 39.8->38.0 ms and 1024p is neutral. The
    gate reflects the measured in-context crossover, not the standalone
    one. IR2RGB_HEAD=direct|fold4 overrides."""
    from .s2d_space import (
        _fold_prec,
        head_fold4_reflect_in_act_s2d,
        instance_norm_act_s2d,
    )
    if _fold4_head_gate(x):
        # reflect variant: no materialized padded image (the pad copy
        # alone cost ~836 us at 2048p) — zero-pad body + exact strips
        return head_fold4_reflect_in_act_s2d(
            x.astype(cfg.compute_dtype), pc["w"].astype(cfg.compute_dtype),
            pc.get("b"), "relu", precision=_fold_prec(cfg.compute_dtype))
    return instance_norm_act_s2d(_head_conv_s2d(pc, x, cfg), "relu")


def _fold4_head_gate(x: jax.Array) -> bool:
    """ONE source of truth for the fold-4 c7s1-head dispatch — both
    _head_in_act_s2d (trunk heads) and _head_fold4_rep (enhancer down0,
    feeding conv_fold4_to_s2d) must take the same branch or the enhancer
    junction sees mismatched reps. Gate: TPU backend, H%4==0, and
    IR2RGB_HEAD=fold4 or auto at >=1024px output (the measured
    in-context crossover — see _head_in_act_s2d's docstring)."""
    out_h, out_w = x.shape[1], x.shape[2]  # c7s1: reflect pad keeps size
    mode = os.environ.get("IR2RGB_HEAD", "auto")
    use_fold4 = (mode == "fold4"
                 or (mode == "auto" and out_h >= 1024))
    return (jax.default_backend() == "tpu"
            and out_h % 4 == 0 and out_w % 4 == 0
            and use_fold4)


# Above this many s2d rows, a res block's reflect pads go through the
# border-fixup conv instead of a materialized pad. At 512px (s2d 128-256
# rows) the materialized k=3 pads cost only ~50 us each and the fixup's
# four strip convs LOSE (240.8 -> 225 fps, round 2); at the 1024/2048
# tiers the same pads are 0.7-1.5 ms each (round-3 profile:
# reflect_pad_s2d's phase-split + compose fusions dominate the enhancer)
# and the thin strips win. IR2RGB_FIXUP_MIN_ROWS overrides for A/B runs
# (the crossover is bracketed at (256, 512] — round-3 measured a loss
# at 256 with the patch-first stats; re-bracketed round 4 with the
# corrected-stats fusion).
_BORDER_FIXUP_MIN_ROWS = int(os.environ.get("IR2RGB_FIXUP_MIN_ROWS", "384"))


def _resnet_block_apply_s2d(p, hs, cfg: GenConfig, *, train=False, rng=None):
    from .s2d_space import (
        conv_reflect_in_act_s2d,
        conv_reflect_s2d,
        _fold_prec,
        instance_norm_act_s2d,
        reflect_pad_s2d,
    )
    big = hs.shape[1] >= _BORDER_FIXUP_MIN_ROWS
    prec = _fold_prec(cfg.compute_dtype)
    corrected = (big and not (cfg.use_dropout and train)
                 and os.environ.get("IR2RGB_BLOCK_STATS",
                                    "patch") == "corrected")
    if corrected:
        # round-4 fusion experiment: conv + border fixup + IN + act in
        # one call with the stats corrected algebraically, so the strip
        # select has a single consumer (see conv_reflect_in_act_s2d)
        c0, c1 = p["conv0"]["conv"], p["conv1"]["conv"]
        h = conv_reflect_in_act_s2d(
            hs.astype(cfg.compute_dtype), c0["w"].astype(cfg.compute_dtype),
            c0.get("b"), "relu", precision=prec)
        h = conv_reflect_in_act_s2d(
            h, c1["w"].astype(cfg.compute_dtype), c1.get("b"), "none",
            precision=prec)
        return hs + h

    def conv_pad1(pc, x):
        if big:
            y = conv_reflect_s2d(x.astype(cfg.compute_dtype),
                                 pc["w"].astype(cfg.compute_dtype),
                                 precision=prec)
            if "b" in pc:
                y = y + jnp.tile(pc["b"].astype(y.dtype), 4)
            return y
        return _conv_s2d_wrap(pc, reflect_pad_s2d(x, 1), cfg, k=3)

    h = conv_pad1(p["conv0"]["conv"], hs)
    h = instance_norm_act_s2d(h, "relu")
    if cfg.use_dropout and train and rng is not None:
        h = ops.dropout(rng, h, 0.5)
    h = conv_pad1(p["conv1"]["conv"], h)
    h = instance_norm_act_s2d(h, "none")
    return hs + h


# ---------------------------------------------------------------------------
# ResNet generator (resnet_9blocks / resnet_6blocks)
# ---------------------------------------------------------------------------

def resnet_generator_init(key, cfg: GenConfig,
                          n_blocks: Optional[int] = None,
                          n_downsampling: int = 2,
                          input_nc: Optional[int] = None,
                          ngf: Optional[int] = None,
                          with_tail: bool = True) -> Params:
    if n_blocks is None:
        n_blocks = 9 if cfg.net_g.endswith("9blocks") else 6
    input_nc = cfg.input_nc if input_nc is None else input_nc
    ngf = cfg.ngf if ngf is None else ngf
    bias = _use_bias(cfg.norm)
    keys = jax.random.split(key, 2 + 2 * n_downsampling + n_blocks + 1)
    ki = iter(keys)
    p: Params = {"head": _conv_norm_init(next(ki), input_nc, ngf, 7,
                                         cfg.norm, bias)}
    mult = 1
    for i in range(n_downsampling):
        p[f"down{i}"] = _conv_norm_init(next(ki), ngf * mult, ngf * mult * 2,
                                        3, cfg.norm, bias)
        mult *= 2
    for i in range(n_blocks):
        p[f"block{i}"] = _resnet_block_init(next(ki), ngf * mult, cfg.norm,
                                            bias)
    for i in range(n_downsampling):
        p[f"up{i}"] = _up_init(next(ki), ngf * mult, ngf * mult // 2, cfg,
                               bias)
        mult //= 2
    if with_tail:
        p["tail"] = {"conv": ops.conv_init(next(ki), ngf, cfg.output_nc, 7)}
    return p


def _check_divisible(x: jax.Array, downs: int, net: str) -> None:
    """Stride-2 stacks need H/W divisible by 2**downs — a 24px input
    through 4 downs bottoms out at 3 -> 2 and comes back 32px, failing
    at the skip junction with a shape error that names no cause. Raise
    the cause instead (the reference family has the same constraint,
    surfaced as fineSize 'must be a multiple of' guidance)."""
    d = 1 << downs
    h, w = x.shape[1], x.shape[2]
    if h % d or w % d:
        raise ValueError(
            f"net_g={net}: input {h}x{w} must be divisible by {d} "
            f"(2^{downs} stride-2 stages); resize/crop the frames or "
            f"lower n_downsample_global/n_local_enhancers")


def resnet_generator_apply(p: Params, x: jax.Array, cfg: GenConfig, *,
                           n_blocks: Optional[int] = None,
                           n_downsampling: int = 2,
                           train: bool = False,
                           rng: Optional[jax.Array] = None,
                           return_s2d: bool = False) -> jax.Array:
    if n_blocks is None:
        n_blocks = 9 if cfg.net_g.endswith("9blocks") else 6
    _check_divisible(x, n_downsampling, cfg.net_g)
    x = x.astype(cfg.compute_dtype)
    if _gen_use_s2d(cfg, x):
        return _resnet_generator_apply_s2d(
            p, x, cfg, n_blocks=n_blocks, n_downsampling=n_downsampling,
            train=train, rng=rng, return_s2d=return_s2d)
    h = ops.reflect_pad(x, 3)
    h = ops.conv_apply(p["head"]["conv"], h, compute_dtype=cfg.compute_dtype)
    h = ops.norm_act(p["head"].get("norm", {}), h, cfg.norm, "relu")
    for i in range(n_downsampling):
        h = ops.conv_apply(p[f"down{i}"]["conv"], h, stride=2, padding=1,
                           compute_dtype=cfg.compute_dtype)
        h = ops.norm_act(p[f"down{i}"].get("norm", {}), h, cfg.norm, "relu")
    rngs = (jax.random.split(rng, n_blocks) if rng is not None else
            [None] * n_blocks)
    for i in range(n_blocks):
        h = _resnet_block_apply(p[f"block{i}"], h, cfg, train=train,
                                rng=rngs[i])
    for i in range(n_downsampling):
        h = _up_apply(p[f"up{i}"], h, cfg)
    if "tail" not in p:
        if return_s2d:
            from .s2d_space import to_s2d
            return to_s2d(h)
        return h  # headless trunk (used by the local enhancer)
    h = ops.reflect_pad(h, 3)
    h = ops.conv_apply(p["tail"]["conv"], h, compute_dtype=cfg.compute_dtype)
    return jnp.tanh(h.astype(jnp.float32)).astype(cfg.compute_dtype)


def _resnet_generator_apply_s2d(p: Params, x: jax.Array, cfg: GenConfig, *,
                                n_blocks: int, n_downsampling: int,
                                train: bool, rng, return_s2d: bool
                                ) -> jax.Array:
    """ResNet/global generator with the high-res segment in s2d space.

    State machine: head + downsamplers run in s2d while the layer's image
    channels stay <= _S2D_MAX_CH; the first wide downsampler exits to the
    plain rep (its stride-2 conv emits it directly, no transpose); ups
    re-enter s2d at the last (or only) narrow upsampler via the subpixel
    deconv's phase output; IN/activation/tail all compute in s2d; one
    depth-to-space on the 3-channel output.
    """
    from .s2d_space import (
        deconv_in_act_s2d,
        from_s2d,
        instance_norm_act_s2d,
    )
    hs = _head_in_act_s2d(p["head"]["conv"], x, cfg)
    in_s2d = True
    h = None
    for i in range(n_downsampling):
        cout = p[f"down{i}"]["conv"]["w"].shape[3]
        if in_s2d:
            stay = cout <= _S2D_MAX_CH
            out = _conv_s2d_wrap(p[f"down{i}"]["conv"], hs, cfg, k=3, pad=1,
                                 stride=2, out_s2d=stay)
            if stay:
                hs = instance_norm_act_s2d(out, "relu")
            else:
                h = ops.norm_act(p[f"down{i}"].get("norm", {}), out,
                                 cfg.norm, "relu")
                in_s2d = False
        else:
            h = ops.conv_apply(p[f"down{i}"]["conv"], h, stride=2, padding=1,
                               compute_dtype=cfg.compute_dtype)
            h = ops.norm_act(p[f"down{i}"].get("norm", {}), h, cfg.norm,
                             "relu")
    rngs = (jax.random.split(rng, n_blocks) if rng is not None else
            [None] * n_blocks)
    for i in range(n_blocks):
        if in_s2d:
            hs = _resnet_block_apply_s2d(p[f"block{i}"], hs, cfg,
                                         train=train, rng=rngs[i])
        else:
            h = _resnet_block_apply(p[f"block{i}"], h, cfg, train=train,
                                    rng=rngs[i])
    for i in range(n_downsampling):
        cout = p[f"up{i}"]["up"]["w"].shape[3]
        last = i == n_downsampling - 1
        if in_s2d:
            # already in s2d on the way up: quad-phase deconv stays
            # there; IN+relu run on the pre-d2s phase rep so the
            # interleave transpose happens once (deconv_in_act_s2d)
            hs = deconv_in_act_s2d(
                hs.astype(cfg.compute_dtype),
                p[f"up{i}"]["up"]["w"].astype(cfg.compute_dtype),
                p[f"up{i}"]["up"].get("b"), "relu")
        elif last or cout <= _S2D_MAX_CH:
            # re-enter s2d: the subpixel deconv's phase output IS the rep
            hs = ops.deconv_apply_s2d_out(p[f"up{i}"]["up"], h, k=3, pad=1,
                                          compute_dtype=cfg.compute_dtype)
            hs = instance_norm_act_s2d(hs, "relu")
            in_s2d = True
        else:
            mode = _up_phase_mode()
            if mode in ("phase", "phase_dot") and cfg.norm == "instance":
                h = _up_apply_phase(p[f"up{i}"], h, cfg, mode)
            else:
                h = _up_apply(p[f"up{i}"], h, cfg)
    if "tail" not in p:
        if return_s2d:
            return hs
        return from_s2d(hs, hs.shape[-1] // 4)
    return _s2d_tail_output(p["tail"]["conv"], hs, cfg, train)


# ---------------------------------------------------------------------------
# pix2pixHD Global generator — a ResNet generator with 4 downs / 9 blocks
# ---------------------------------------------------------------------------

def global_generator_init(key, cfg: GenConfig, ngf: Optional[int] = None,
                          with_tail: bool = True) -> Params:
    return resnet_generator_init(
        key, cfg, n_blocks=cfg.n_blocks_global,
        n_downsampling=cfg.n_downsample_global, ngf=ngf, with_tail=with_tail)


def global_generator_apply(p, x, cfg: GenConfig, *, train=False, rng=None):
    return resnet_generator_apply(
        p, x, cfg, n_blocks=cfg.n_blocks_global,
        n_downsampling=cfg.n_downsample_global, train=train, rng=rng)


# ---------------------------------------------------------------------------
# pix2pixHD Local enhancer (coarse-to-fine)
# ---------------------------------------------------------------------------

def local_enhancer_init(key, cfg: GenConfig) -> Params:
    """Global trunk (at 1/2^n_local_enhancers res, output head stripped,
    width ngf * 2^n_local_enhancers) + per-level enhancer branches."""
    n_local = cfg.n_local_enhancers
    ngf_global = cfg.ngf * (2 ** n_local)
    keys = jax.random.split(key, 1 + n_local)
    p: Params = {"global": resnet_generator_init(
        keys[0], cfg, n_blocks=cfg.n_blocks_global,
        n_downsampling=cfg.n_downsample_global, ngf=ngf_global,
        with_tail=False)}
    bias = _use_bias(cfg.norm)
    for n in range(1, n_local + 1):
        ngf_n = cfg.ngf * (2 ** (n_local - n))
        ks = jax.random.split(keys[n], 3 + cfg.n_blocks_local + 1)
        enh: Params = {
            "down0": _conv_norm_init(ks[0], cfg.input_nc, ngf_n, 7, cfg.norm,
                                     bias),
            "down1": _conv_norm_init(ks[1], ngf_n, ngf_n * 2, 3, cfg.norm,
                                     bias),
        }
        for i in range(cfg.n_blocks_local):
            enh[f"block{i}"] = _resnet_block_init(ks[2 + i], ngf_n * 2,
                                                  cfg.norm, bias)
        enh["up"] = _up_init(ks[2 + cfg.n_blocks_local], ngf_n * 2, ngf_n,
                             cfg, bias)
        if n == n_local:
            enh["tail"] = {"conv": ops.conv_init(ks[-1], ngf_n,
                                                 cfg.output_nc, 7)}
        p[f"enhancer{n}"] = enh
    return p


def local_enhancer_apply(p: Params, x: jax.Array, cfg: GenConfig, *,
                         train: bool = False,
                         rng: Optional[jax.Array] = None) -> jax.Array:
    n_local = cfg.n_local_enhancers
    _check_divisible(x, n_local + cfg.n_downsample_global, cfg.net_g)
    x = x.astype(cfg.compute_dtype)
    # input pyramid: x at full res, then avg-pool halvings
    pyramid = [x]
    for _ in range(n_local):
        pyramid.append(ops.avg_pool(pyramid[-1], 3, 2, 1,
                                    count_include_pad=False))
    if _gen_use_s2d(cfg, x):
        return _local_enhancer_apply_s2d(p, pyramid, cfg, train=train,
                                         rng=rng)
    out = resnet_generator_apply(
        p["global"], pyramid[-1], cfg, n_blocks=cfg.n_blocks_global,
        n_downsampling=cfg.n_downsample_global, train=train, rng=rng)
    for n in range(1, n_local + 1):
        enh = p[f"enhancer{n}"]
        xi = pyramid[n_local - n]
        h = ops.reflect_pad(xi, 3)
        h = ops.conv_apply(enh["down0"]["conv"], h,
                           compute_dtype=cfg.compute_dtype)
        h = ops.norm_act(enh["down0"].get("norm", {}), h, cfg.norm, "relu")
        h = ops.conv_apply(enh["down1"]["conv"], h, stride=2, padding=1,
                           compute_dtype=cfg.compute_dtype)
        h = ops.norm_act(enh["down1"].get("norm", {}), h, cfg.norm, "relu")
        h = h + out  # elementwise junction between global trunk and branch
        for i in range(cfg.n_blocks_local):
            h = _resnet_block_apply(enh[f"block{i}"], h, cfg, train=train)
        h = _up_apply(enh["up"], h, cfg)
        out = h
        if n == n_local:
            h = ops.reflect_pad(h, 3)
            h = ops.conv_apply(enh["tail"]["conv"], h,
                               compute_dtype=cfg.compute_dtype)
            out = jnp.tanh(h.astype(jnp.float32)).astype(cfg.compute_dtype)
    return out


def _head_fold4_rep(pc, x, cfg: GenConfig):
    """When the fold-4 head gate applies (see _head_in_act_s2d), return
    the head's normalized PRE-d2s fold-4 rep for a conv_fold4_to_s2d
    consumer; else None (caller takes the s2d path)."""
    from .s2d_space import _fold_prec, head_fold4_reflect_in_act_s2d
    if not _fold4_head_gate(x):
        return None
    return head_fold4_reflect_in_act_s2d(
        x.astype(cfg.compute_dtype), pc["w"].astype(cfg.compute_dtype),
        pc.get("b"), "relu", precision=_fold_prec(cfg.compute_dtype),
        emit_d2s=False)


def _use_fold4_tail(hs: jax.Array) -> bool:
    """Gate for the fold-4 tail fusion (final enhancer level): the
    deconv's pre-d2s rep feeds the tail directly, skipping the d2s
    transpose. In-context on the v5e (round 3): WINS at the 2048 tier
    (37.6 -> 37.3 ms), LOSES at 1024p (12.9 -> 13.7 ms) and 512p
    (285 -> 263 fps local, 293 -> 271 temporal) where the d2s it saves
    is small and the fold-4 conv's layouts retile neighbours — gate to
    the 2048 tier (pre-up s2d rep >= 512 rows).
    IR2RGB_TAIL=fold4|s2d overrides."""
    if jax.default_backend() != "tpu":
        return False
    mode = os.environ.get("IR2RGB_TAIL", "auto")
    if mode == "fold4":
        return True
    if mode == "s2d":
        return False
    return hs.shape[1] >= 512


def _local_enhancer_apply_s2d(p: Params, pyramid, cfg: GenConfig, *,
                              train: bool, rng) -> jax.Array:
    """Coarse-to-fine in s2d space: the trunk hands its (headless) output
    over as an s2d rep; each enhancer level computes its branch, junction,
    residual blocks, upsample, and tail without leaving s2d."""
    from .s2d_space import (
        deconv_in_act_s2d,
        instance_norm_act_s2d,
    )
    n_local = cfg.n_local_enhancers
    out_s2d = resnet_generator_apply(
        p["global"], pyramid[-1], cfg, n_blocks=cfg.n_blocks_global,
        n_downsampling=cfg.n_downsample_global, train=train, rng=rng,
        return_s2d=True)
    for n in range(1, n_local + 1):
        enh = p[f"enhancer{n}"]
        xi = pyramid[n_local - n]
        h4 = _head_fold4_rep(enh["down0"]["conv"], xi, cfg)
        if h4 is not None:
            # head stayed in its fold-4 rep: down1 reads it directly
            # (conv_fold4_to_s2d) — no d2s between head and down1
            from .s2d_space import _fold_prec, conv_fold4_to_s2d
            prec = _fold_prec(cfg.compute_dtype)
            d1 = enh["down1"]["conv"]
            hs = conv_fold4_to_s2d(
                h4, d1["w"].astype(cfg.compute_dtype), precision=prec)
            if "b" in d1:
                hs = hs + jnp.tile(d1["b"].astype(hs.dtype), 4)
        else:
            hs = _head_in_act_s2d(enh["down0"]["conv"], xi, cfg)
            # stride-2 down, staying in s2d (emits the half-res s2d rep)
            hs = _conv_s2d_wrap(enh["down1"]["conv"], hs, cfg, k=3,
                                pad=1, stride=2, out_s2d=True)
        hs = instance_norm_act_s2d(hs, "relu")
        hs = hs + out_s2d  # junction, both s2d reps of the half-res map
        for i in range(cfg.n_blocks_local):
            hs = _resnet_block_apply_s2d(enh[f"block{i}"], hs, cfg,
                                         train=train)
        # upsample: quad-phase deconv, s2d in -> s2d out (no plain
        # hop); IN+relu on the pre-d2s phase rep (one transpose)
        up_w = enh["up"]["up"]["w"].astype(cfg.compute_dtype)
        up_b = enh["up"]["up"].get("b")
        if n == n_local and _use_fold4_tail(hs):
            # final level: the tail reads the deconv's pre-d2s fold-4
            # rep directly — the d2s transpose never happens
            from .s2d_space import tail_from_fold4
            y4 = deconv_in_act_s2d(hs.astype(cfg.compute_dtype), up_w,
                                   up_b, "relu", emit_d2s=False)
            tp = enh["tail"]["conv"]
            out = tail_from_fold4(y4, tp["w"].astype(cfg.compute_dtype),
                                  tp.get("b"))
            return out.astype(cfg.compute_dtype)
        hs = deconv_in_act_s2d(hs.astype(cfg.compute_dtype), up_w, up_b,
                               "relu")
        out_s2d = hs
        if n == n_local:
            return _s2d_tail_output(enh["tail"]["conv"], hs, cfg, train)
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# U-Net generator (unet_256 / unet_128)
# ---------------------------------------------------------------------------
#
# Level structure (outer -> inner), matching the family's recursive
# UnetSkipConnectionBlock:
#   outermost: down = conv;             up = relu, deconv(k4), tanh
#   middle:    down = lrelu, conv, nrm; up = relu, deconv(k4), nrm [,drop]
#   innermost: down = lrelu, conv;      up = relu, deconv(k4), nrm
# Channel plan for unet_256 (8 downs): ngf,2,4,8,8,8,8,8.

def _unet_channels(num_downs: int, ngf: int) -> List[int]:
    chans = []
    for i in range(num_downs):
        chans.append(ngf * min(2 ** i, 8))
    return chans


def unet_generator_init(key, cfg: GenConfig) -> Params:
    num_downs = 8 if cfg.net_g == "unet_256" else 7
    chans = _unet_channels(num_downs, cfg.ngf)
    bias = _use_bias(cfg.norm)
    keys = jax.random.split(key, num_downs)
    p: Params = {}
    for i in range(num_downs):
        cin = cfg.input_nc if i == 0 else chans[i - 1]
        cout = chans[i]
        innermost = i == num_downs - 1
        outermost = i == 0
        kd, ku, kn1, kn2 = jax.random.split(keys[i], 4)
        level: Params = {
            "down_conv": ops.conv_init(kd, cin, cout, 4, use_bias=bias),
        }
        if not outermost and not innermost:
            level["down_norm"] = ops.norm_init(kn1, cfg.norm, cout)
        # up path: innermost deconv sees no skip concat; others take 2*cout
        up_cin = cout if innermost else cout * 2
        up_cout = cfg.output_nc if outermost else chans[i - 1]
        level["up_conv"] = ops.deconv_init(ku, up_cin, up_cout, 4,
                                           use_bias=bias or outermost)
        if not outermost:
            level["up_norm"] = ops.norm_init(kn2, cfg.norm, up_cout)
        p[f"level{i}"] = level
    return p


def unet_generator_apply(p: Params, x: jax.Array, cfg: GenConfig, *,
                         train: bool = False,
                         rng: Optional[jax.Array] = None) -> jax.Array:
    num_downs = 8 if cfg.net_g == "unet_256" else 7
    _check_divisible(x, num_downs, cfg.net_g)
    x = x.astype(cfg.compute_dtype)
    skips: List[jax.Array] = []
    h = x
    # encoder
    for i in range(num_downs):
        level = p[f"level{i}"]
        if i > 0:
            h = ops.apply_act(h, "leaky_relu")
        h = ops.conv_apply(level["down_conv"], h, stride=2, padding=1,
                           compute_dtype=cfg.compute_dtype)
        if 0 < i < num_downs - 1:  # middle levels carry a down norm
            h = ops.apply_norm(level.get("down_norm", {}), h, cfg.norm)
        skips.append(h)
    # decoder
    n_drop = max(num_downs - 5, 0)  # dropout on the inner middle levels
    drop_rngs = (list(jax.random.split(rng, max(n_drop, 1)))
                 if rng is not None else [])
    for i in range(num_downs - 1, -1, -1):
        level = p[f"level{i}"]
        h = ops.apply_act(h, "relu")
        h = ops.deconv_apply(level["up_conv"], h, stride=2, k=4, pad=1,
                             output_padding=0,
                             compute_dtype=cfg.compute_dtype)
        if i == 0:
            return jnp.tanh(h.astype(jnp.float32)).astype(cfg.compute_dtype)
        h = ops.apply_norm(level.get("up_norm", {}), h, cfg.norm)
        # dropout applies to the deepest middle levels (unet_256: levels 4..6)
        if (cfg.use_dropout and train and drop_rngs
                and num_downs - 1 - n_drop <= i <= num_downs - 2):
            h = ops.dropout(drop_rngs[(num_downs - 2) - i], h, 0.5)
        h = jnp.concatenate([skips[i - 1], h], axis=-1)
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Factory (reference define_G analog)
# ---------------------------------------------------------------------------

def define_g(cfg: GenConfig):
    """Returns (init, apply) for the configured generator."""
    name = cfg.net_g
    if name in ("resnet_9blocks", "resnet_6blocks"):
        return (lambda key: resnet_generator_init(key, cfg),
                lambda p, x, **kw: resnet_generator_apply(p, x, cfg, **kw))
    if name in ("unet_256", "unet_128"):
        return (lambda key: unet_generator_init(key, cfg),
                lambda p, x, **kw: unet_generator_apply(p, x, cfg, **kw))
    if name == "global":
        return (lambda key: global_generator_init(key, cfg),
                lambda p, x, **kw: global_generator_apply(p, x, cfg, **kw))
    if name == "local":
        return (lambda key: local_enhancer_init(key, cfg),
                lambda p, x, **kw: local_enhancer_apply(p, x, cfg, **kw))
    raise ValueError(f"unknown net_g: {name}")
