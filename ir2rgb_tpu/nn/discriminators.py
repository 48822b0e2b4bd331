"""Discriminator zoo — 70x70 PatchGAN and multi-scale pyramid.

Rebuilds the reference discriminators (``models/networks.py`` —
SURVEY.md §2.1):

- ``NLayerDiscriminator`` (70x70 PatchGAN, BASELINE.json:8): C64-C128-C256-
  C512 with 4x4 convs, stride 2 (last two stride 1), LeakyReLU(0.2), norm
  from the second conv on, final 1-channel conv producing a patch-logit map.
- ``MultiscaleDiscriminator`` (BASELINE.json:9): ``num_d`` PatchGANs over an
  image pyramid built with stride-2 3x3 avg-pool (count_include_pad=False);
  returns per-scale lists of features/logits (outermost list ordered from
  the finest-input D to the coarsest, matching the family convention of
  indexing D_0 = full resolution).

``get_interm_feat`` taps every intermediate activation for the
feature-matching loss. Patch logits stay fp32 (GAN-loss stability under
bf16 — SURVEY.md §7 hard-part #4).

``d_pad``: the family has two padding conventions for the 4x4 convs —
pix2pix uses 1, pix2pixHD uses 2. Configurable for checkpoint parity;
default follows the conditional-HD lineage (2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from . import ops
from .ops import Params


@dataclasses.dataclass(frozen=True)
class DiscConfig:
    net_d: str = "n_layers"  # n_layers | multiscale | pixel
    input_nc: int = 6  # conditional GAN: cat(IR input, RGB output)
    ndf: int = 64
    n_layers: int = 3
    num_d: int = 2
    norm: str = "instance"
    get_interm_feat: bool = True
    d_pad: int = 2  # 2 = pix2pixHD convention, 1 = pix2pix convention
    compute_dtype: Any = jnp.float32


def _use_bias(norm: str) -> bool:
    return norm != "batch"


# ---------------------------------------------------------------------------
# NLayerDiscriminator (70x70 PatchGAN)
# ---------------------------------------------------------------------------

def n_layer_disc_init(key, cfg: DiscConfig) -> Params:
    bias = _use_bias(cfg.norm)
    keys = jax.random.split(key, cfg.n_layers + 2)
    p: Params = {"conv0": {"conv": ops.conv_init(keys[0], cfg.input_nc,
                                                 cfg.ndf, 4)}}
    nf = cfg.ndf
    for n in range(1, cfg.n_layers):
        nf_prev, nf = nf, min(nf * 2, 512)
        p[f"conv{n}"] = {
            "conv": ops.conv_init(keys[n], nf_prev, nf, 4, use_bias=bias),
            "norm": ops.norm_init(keys[n], cfg.norm, nf),
        }
    nf_prev, nf = nf, min(nf * 2, 512)
    p[f"conv{cfg.n_layers}"] = {
        "conv": ops.conv_init(keys[cfg.n_layers], nf_prev, nf, 4,
                              use_bias=bias),
        "norm": ops.norm_init(keys[cfg.n_layers], cfg.norm, nf),
    }
    p["head"] = {"conv": ops.conv_init(keys[-1], nf, 1, 4)}
    return p


def n_layer_disc_apply(p: Params, x: jax.Array,
                       cfg: DiscConfig) -> List[jax.Array]:
    """Returns [feat_0, ..., feat_k, logits]; only the last element when
    ``get_interm_feat`` is off."""
    x = x.astype(cfg.compute_dtype)
    feats: List[jax.Array] = []
    h = ops.conv_apply(p["conv0"]["conv"], x, stride=2, padding=cfg.d_pad,
                       compute_dtype=cfg.compute_dtype)
    h = ops.apply_act(h, "leaky_relu")
    feats.append(h)
    for n in range(1, cfg.n_layers):
        h = ops.conv_apply(p[f"conv{n}"]["conv"], h, stride=2,
                           padding=cfg.d_pad, compute_dtype=cfg.compute_dtype)
        h = ops.norm_act(p[f"conv{n}"].get("norm", {}), h, cfg.norm, "leaky_relu")
        feats.append(h)
    h = ops.conv_apply(p[f"conv{cfg.n_layers}"]["conv"], h, stride=1,
                       padding=cfg.d_pad, compute_dtype=cfg.compute_dtype)
    h = ops.norm_act(p[f"conv{cfg.n_layers}"].get("norm", {}), h, cfg.norm,
                     "leaky_relu")
    feats.append(h)
    logits = ops.conv_apply(p["head"]["conv"], h, stride=1, padding=cfg.d_pad,
                            compute_dtype=cfg.compute_dtype)
    # Always raw fp32 logits. The reference's vanilla mode applies
    # sigmoid in the net and BCE in the loss; we keep the mathematically
    # equivalent (and bf16-stable) logits + BCE-with-logits formulation
    # in losses/gan.py, so no in-net sigmoid knob exists.
    logits = logits.astype(jnp.float32)
    feats.append(logits)
    return feats if cfg.get_interm_feat else [logits]


# ---------------------------------------------------------------------------
# PixelDiscriminator (1x1 PatchGAN, the family's --netD pixel)
# ---------------------------------------------------------------------------

def pixel_disc_init(key, cfg: DiscConfig) -> Params:
    """C64-C128-1 with 1x1 convs: per-pixel real/fake decisions (the
    pytorch-CycleGAN-and-pix2pix ``PixelDiscriminator``)."""
    bias = _use_bias(cfg.norm)
    keys = jax.random.split(key, 3)
    return {
        "conv0": {"conv": ops.conv_init(keys[0], cfg.input_nc, cfg.ndf, 1)},
        "conv1": {"conv": ops.conv_init(keys[1], cfg.ndf, cfg.ndf * 2, 1,
                                        use_bias=bias),
                  "norm": ops.norm_init(keys[1], cfg.norm, cfg.ndf * 2)},
        # the reference builds the final conv with bias=use_bias too
        # (no bias under batch norm, even though no norm follows it) —
        # match it so param trees line up with imports/exports
        "head": {"conv": ops.conv_init(keys[2], cfg.ndf * 2, 1, 1,
                                       use_bias=bias)},
    }


def pixel_disc_apply(p: Params, x: jax.Array,
                     cfg: DiscConfig) -> List[jax.Array]:
    """Same feats+logits contract as n_layer_disc_apply."""
    x = x.astype(cfg.compute_dtype)
    feats: List[jax.Array] = []
    h = ops.conv_apply(p["conv0"]["conv"], x,
                       compute_dtype=cfg.compute_dtype)
    h = ops.apply_act(h, "leaky_relu")
    feats.append(h)
    h = ops.conv_apply(p["conv1"]["conv"], h,
                       compute_dtype=cfg.compute_dtype)
    h = ops.norm_act(p["conv1"].get("norm", {}), h, cfg.norm, "leaky_relu")
    feats.append(h)
    logits = ops.conv_apply(p["head"]["conv"], h,
                            compute_dtype=cfg.compute_dtype)
    logits = logits.astype(jnp.float32)  # fp32 logits, as everywhere
    feats.append(logits)
    return feats if cfg.get_interm_feat else [logits]


# ---------------------------------------------------------------------------
# MultiscaleDiscriminator
# ---------------------------------------------------------------------------

def multiscale_disc_init(key, cfg: DiscConfig) -> Params:
    keys = jax.random.split(key, cfg.num_d)
    return {f"scale{i}": n_layer_disc_init(keys[i], cfg)
            for i in range(cfg.num_d)}


def multiscale_disc_apply(p: Params, x: jax.Array,
                          cfg: DiscConfig) -> List[List[jax.Array]]:
    """Returns [scale_0 (full res), scale_1 (half res), ...], each a
    feats+logits list as in ``n_layer_disc_apply``."""
    outs: List[List[jax.Array]] = []
    xi = x
    for i in range(cfg.num_d):
        outs.append(n_layer_disc_apply(p[f"scale{i}"], xi, cfg))
        if i != cfg.num_d - 1:
            xi = ops.avg_pool(xi, 3, 2, 1, count_include_pad=False)
    return outs


# ---------------------------------------------------------------------------
# Factory (reference define_D analog)
# ---------------------------------------------------------------------------

def define_d(cfg: DiscConfig):
    """Returns (init, apply). apply always yields the multiscale structure
    (list of per-scale feats+logits lists) so losses are uniform."""
    if cfg.net_d == "n_layers":
        return (lambda key: n_layer_disc_init(key, cfg),
                lambda params, x: [n_layer_disc_apply(params, x, cfg)])
    if cfg.net_d == "pixel":
        return (lambda key: pixel_disc_init(key, cfg),
                lambda params, x: [pixel_disc_apply(params, x, cfg)])
    if cfg.net_d == "multiscale":
        return (lambda key: multiscale_disc_init(key, cfg),
                lambda params, x: multiscale_disc_apply(params, x, cfg))
    raise ValueError(f"unknown net_d: {cfg.net_d}")
