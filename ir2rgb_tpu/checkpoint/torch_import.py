"""One-way torch ``.pth`` state_dict → parameter-pytree importer.

The parity bar (BASELINE.json:5) requires this framework to reproduce a
reference PyTorch checkpoint's outputs frame-for-frame (>=40 dB PSNR), so
reference checkpoints must load directly (SURVEY.md §3.4: the reference
saves ``<epoch>_net_<G|D>.pth`` plain state_dicts).

Import strategy — *order-based*, not index-based: the reference family
builds nets as ``nn.Sequential`` chains whose numeric indices shift with
norm/dropout choices, but the **order** of parameterized layers is fixed by
the architecture. We therefore walk the state_dict in insertion order,
take the 4-D conv weights (and 1-D norm params where present) as they
appear, and assign them to this framework's named slots in canonical
architecture order. Layout conversions:

- conv weight OIHW → HWIO (transpose 2,3,1,0);
- transposed-conv weight IOHW → spatially flipped HWIO (our canonical
  storage is the equivalent *forward* conv kernel — see ops.deconv_apply);
- batch-norm weight/bias/running stats pass through 1-D.

Sub-net prefix grouping handles composite modules (pix2pixHD
LocalEnhancer: 'model' = global trunk, 'model1_1'/'model1_2' = enhancer
branches; MultiscaleDiscriminator: 'scale{i}_layer{j}' — note the family
indexes scale 0 = coarsest, while this framework uses scale 0 = full
resolution, so scales are reversed on import).
"""

from __future__ import annotations

import re
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ir2rgb_tpu.nn.generators import GenConfig
from ir2rgb_tpu.nn.discriminators import DiscConfig

Params = Dict[str, Any]


def load_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    """Read a torch .pth into an ordered name->ndarray dict (CPU)."""
    import torch  # local import: torch is only needed for importing
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# Layout conversions
# ---------------------------------------------------------------------------

def conv_w(w: np.ndarray) -> jnp.ndarray:
    """torch Conv2d OIHW -> HWIO."""
    return jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))


def deconv_w(w: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d IOHW -> flipped HWIO (forward-conv kernel)."""
    return jnp.asarray(np.ascontiguousarray(
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)))


# ---------------------------------------------------------------------------
# Slot plans: canonical (path, kind) sequences per architecture.
# kind: conv | deconv | norm
# ---------------------------------------------------------------------------

SlotPlan = List[Tuple[Tuple[str, ...], str]]


def _resnet_plan(n_downsampling: int, n_blocks: int, norm: str,
                 upsample: str, with_tail: bool = True,
                 base: Tuple[str, ...] = ()) -> SlotPlan:
    up_kind = "deconv" if upsample == "deconv" else "conv"
    plan: SlotPlan = [(base + ("head", "conv"), "conv")]
    if norm == "batch":
        plan.append((base + ("head", "norm"), "norm"))
    for i in range(n_downsampling):
        plan.append((base + (f"down{i}", "conv"), "conv"))
        if norm == "batch":
            plan.append((base + (f"down{i}", "norm"), "norm"))
    for i in range(n_blocks):
        for j in range(2):
            plan.append((base + (f"block{i}", f"conv{j}", "conv"), "conv"))
            if norm == "batch":
                plan.append((base + (f"block{i}", f"conv{j}", "norm"),
                             "norm"))
    for i in range(n_downsampling):
        plan.append((base + (f"up{i}", "up"), up_kind))
        if norm == "batch":
            plan.append((base + (f"up{i}", "norm"), "norm"))
    if with_tail:
        plan.append((base + ("tail", "conv"), "conv"))
    return plan


def _unet_plan(num_downs: int, norm: str) -> SlotPlan:
    """state_dict order: down0..downN-1 (outer->inner), then upN-1..up0."""
    plan: SlotPlan = []
    for i in range(num_downs):
        plan.append(((f"level{i}", "down_conv"), "conv"))
        if norm == "batch" and 0 < i < num_downs - 1:
            plan.append(((f"level{i}", "down_norm"), "norm"))
    for i in range(num_downs - 1, -1, -1):
        plan.append(((f"level{i}", "up_conv"), "deconv"))
        if norm == "batch" and i > 0:
            plan.append(((f"level{i}", "up_norm"), "norm"))
    return plan


def _nlayer_plan(n_layers: int, norm: str,
                 base: Tuple[str, ...] = ()) -> SlotPlan:
    plan: SlotPlan = [(base + ("conv0", "conv"), "conv")]
    for n in range(1, n_layers + 1):
        plan.append((base + (f"conv{n}", "conv"), "conv"))
        if norm == "batch":
            plan.append((base + (f"conv{n}", "norm"), "norm"))
    plan.append((base + ("head", "conv"), "conv"))
    return plan


# ---------------------------------------------------------------------------
# Order-based assignment
# ---------------------------------------------------------------------------

def _is_norm_weight(name: str, arr: np.ndarray,
                    sd: Dict[str, np.ndarray]) -> bool:
    return arr.ndim == 1 and name.endswith(".weight")


def _iter_layers(sd: "OrderedDict[str, np.ndarray]"):
    """Group state_dict entries into layers, preserving order.

    Yields (kind, dict) with kind 'conv4d' (weight + optional bias) or
    'norm1d' (weight/bias [+ running stats]).
    """
    items = list(sd.items())
    i = 0
    while i < len(items):
        name, arr = items[i]
        base = name.rsplit(".", 1)[0]
        if name.endswith(".weight") and arr.ndim == 4:
            layer = {"weight": arr, "names": {"weight": name}}
            if i + 1 < len(items) and items[i + 1][0] == base + ".bias":
                layer["bias"] = items[i + 1][1]
                layer["names"]["bias"] = items[i + 1][0]
                i += 1
            yield "conv4d", layer
        elif _is_norm_weight(name, arr, sd):
            layer = {"weight": arr, "names": {"weight": name}}
            j = i + 1
            while j < len(items) and items[j][0].startswith(base + "."):
                suffix = items[j][0][len(base) + 1:]
                if suffix in ("bias", "running_mean", "running_var"):
                    layer[suffix] = items[j][1]
                    layer["names"][suffix] = items[j][0]
                    j += 1
                else:
                    break
            i = j - 1
            yield "norm1d", layer
        # 0-d num_batches_tracked etc. are skipped
        i += 1


def _set_path(tree: Params, path: Tuple[str, ...], value: Params) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def assign_from_plan(sd: "OrderedDict[str, np.ndarray]",
                     plan: SlotPlan) -> Params:
    """Assign state_dict layers (in order) to plan slots (in order)."""
    params: Params = {}
    layers = list(_iter_layers(sd))
    plan_convs = [(p, k) for p, k in plan if k in ("conv", "deconv")]
    plan_norms = [(p, k) for p, k in plan if k == "norm"]
    got_convs = [l for kind, l in layers if kind == "conv4d"]
    got_norms = [l for kind, l in layers if kind == "norm1d"]
    if len(got_convs) != len(plan_convs):
        raise ValueError(
            f"conv count mismatch: checkpoint has {len(got_convs)}, "
            f"architecture expects {len(plan_convs)}")
    if len(got_norms) != len(plan_norms):
        # covers BOTH directions, including plan_norms == [] with an
        # affine-norm checkpoint: silently discarding the checkpoint's
        # BatchNorm gamma/beta/running stats (e.g. importing a
        # --norm batch .pth into a --norm instance config) would load
        # cleanly and generate garbage with no diagnostic
        raise ValueError(
            f"norm-parameter count mismatch: checkpoint has "
            f"{len(got_norms)} affine norm layer(s), the configured "
            f"architecture expects {len(plan_norms)} — check --norm "
            f"(instance norms carry no parameters; batch norms do)")
    for (path, kind), layer in zip(plan_convs, got_convs):
        w = deconv_w(layer["weight"]) if kind == "deconv" else conv_w(
            layer["weight"])
        slot: Params = {"w": w}
        if "bias" in layer:
            slot["b"] = jnp.asarray(layer["bias"])
        _set_path(params, path, slot)
    for (path, _), layer in zip(plan_norms, got_norms):
        slot = {"gamma": jnp.asarray(layer["weight"]),
                "beta": jnp.asarray(layer["bias"])}
        if "running_mean" in layer:
            slot["running_mean"] = jnp.asarray(layer["running_mean"])
            slot["running_var"] = jnp.asarray(layer["running_var"])
        _set_path(params, path, slot)
    return params


def _filter_prefix(sd: "OrderedDict[str, np.ndarray]",
                   prefix: str) -> "OrderedDict[str, np.ndarray]":
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Public importers
# ---------------------------------------------------------------------------

def import_generator(sd_or_path, cfg: GenConfig,
                     n_blocks: Optional[int] = None,
                     n_downsampling: int = 2) -> Params:
    sd = (load_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else sd_or_path)
    name = cfg.net_g
    if name in ("resnet_9blocks", "resnet_6blocks"):
        if n_blocks is None:
            n_blocks = 9 if name.endswith("9blocks") else 6
        plan = _resnet_plan(n_downsampling, n_blocks, cfg.norm, cfg.upsample)
        return assign_from_plan(sd, plan)
    if name == "global":
        plan = _resnet_plan(cfg.n_downsample_global, cfg.n_blocks_global,
                            cfg.norm, cfg.upsample)
        return assign_from_plan(sd, plan)
    if name in ("unet_256", "unet_128"):
        num_downs = 8 if name == "unet_256" else 7
        return assign_from_plan(sd, _unet_plan(num_downs, cfg.norm))
    if name == "local":
        params: Params = {}
        # global trunk (headless) under 'model'
        gsd = _filter_prefix(sd, "model.")
        gplan = _resnet_plan(cfg.n_downsample_global, cfg.n_blocks_global,
                             cfg.norm, cfg.upsample, with_tail=False)
        params["global"] = assign_from_plan(gsd, gplan)
        for n in range(1, cfg.n_local_enhancers + 1):
            down_sd = _filter_prefix(sd, f"model{n}_1.")
            up_sd = _filter_prefix(sd, f"model{n}_2.")
            enh_plan_down: SlotPlan = [(("down0", "conv"), "conv")]
            if cfg.norm == "batch":
                enh_plan_down.append((("down0", "norm"), "norm"))
            enh_plan_down.append((("down1", "conv"), "conv"))
            if cfg.norm == "batch":
                enh_plan_down.append((("down1", "norm"), "norm"))
            enh = assign_from_plan(down_sd, enh_plan_down)
            enh_plan_up: SlotPlan = []
            for i in range(cfg.n_blocks_local):
                for j in range(2):
                    enh_plan_up.append(((f"block{i}", f"conv{j}", "conv"),
                                        "conv"))
                    if cfg.norm == "batch":
                        enh_plan_up.append(((f"block{i}", f"conv{j}",
                                             "norm"), "norm"))
            enh_plan_up.append((("up", "up"),
                                "deconv" if cfg.upsample == "deconv"
                                else "conv"))
            if cfg.norm == "batch":
                enh_plan_up.append((("up", "norm"), "norm"))
            if n == cfg.n_local_enhancers:
                enh_plan_up.append((("tail", "conv"), "conv"))
            enh.update(assign_from_plan(up_sd, enh_plan_up))
            params[f"enhancer{n}"] = enh
        return params
    raise ValueError(f"unknown net_g: {name}")


def import_discriminator(sd_or_path, cfg: DiscConfig) -> Params:
    sd = (load_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else sd_or_path)
    if cfg.net_d == "n_layers":
        return assign_from_plan(sd, _nlayer_plan(cfg.n_layers, cfg.norm))
    if cfg.net_d == "pixel":
        # PixelDiscriminator: conv0, conv1(+norm), head — structurally
        # the n_layers=1 plan (kernel sizes differ, counts don't)
        return assign_from_plan(sd, _nlayer_plan(1, cfg.norm))
    if cfg.net_d == "multiscale":
        params: Params = {}
        scale_keys = sorted({m.group(1) for m in
                             (re.match(r"(scale\d+)_", k) for k in sd)
                             if m})
        if scale_keys:
            # family convention: torch scale{num_d-1} sees full resolution
            for i, sk in enumerate(sorted(scale_keys, reverse=True)):
                ssd = _filter_prefix(sd, sk + "_")
                params[f"scale{i}"] = assign_from_plan(
                    ssd, _nlayer_plan(cfg.n_layers, cfg.norm))
        else:
            # no-getIntermFeat naming: layer0..layer{num_d-1}
            for i in range(cfg.num_d):
                ssd = _filter_prefix(sd, f"layer{cfg.num_d - 1 - i}")
                params[f"scale{i}"] = assign_from_plan(
                    ssd, _nlayer_plan(cfg.n_layers, cfg.norm))
        return params
    raise ValueError(f"unknown net_d: {cfg.net_d}")


# ---------------------------------------------------------------------------
# VGG19 (torchvision vgg19 'features' state dict -> npz for nn/vgg.py)
# ---------------------------------------------------------------------------

def convert_vgg19_pth(pth_path: str, npz_out: str,
                      num_convs: int = 13) -> None:
    """Convert torchvision's vgg19 .pth to the npz format vgg19_init reads.

    Only the first ``num_convs`` convs (through conv5_1) are needed for the
    5-stage perceptual loss.
    """
    sd = load_state_dict(pth_path)
    convs = [(k, v) for k, v in sd.items()
             if v.ndim == 4 and ("features" in k or k.endswith(".weight"))]
    out: Dict[str, np.ndarray] = {}
    i = 0
    for k, w in convs:
        if i >= num_convs:
            break
        base = k.rsplit(".", 1)[0]
        out[f"conv{i}_w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        out[f"conv{i}_b"] = sd[base + ".bias"]
        i += 1
    np.savez(npz_out, **out)
