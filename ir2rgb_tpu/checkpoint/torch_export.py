"""Parameter-pytree → torch ``.pth`` state_dict exporter (the importer's
mirror — close the migration loop).

``torch_import.py`` lets reference checkpoints run here; this module lets
checkpoints *trained here* run in the reference's PyTorch stack
(SURVEY.md §3.4: the reference loads plain ``<epoch>_net_<G|D>.pth``
state_dicts), so a user can train on TPU and deploy into an unchanged
torch serving path.

Export strategy — *template-fill*, the exact mirror of the importer's
order-based reading: torch ``nn.Sequential`` index names depend on
norm/dropout/padding module counts, so instead of synthesizing names we
take a **template state_dict** (produced once from the reference code:
``torch.save(create_model(opt).netG.state_dict(), 't.pth')``, or any
existing reference checkpoint of the same architecture) and fill its
entries, in order, with this framework's parameters converted back to
torch layouts:

- conv weight HWIO → OIHW;
- transposed conv: our canonical forward-conv HWIO kernel → spatially
  flipped IOHW (inverse of ``torch_import.deconv_w``);
- norm gamma/beta (+ running stats) pass through 1-D.

Every filled entry is shape-checked against the template, so an
architecture/template mismatch fails loudly at the offending layer
rather than producing a silently wrong checkpoint.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ir2rgb_tpu.nn.generators import GenConfig
from ir2rgb_tpu.nn.discriminators import DiscConfig

from .torch_import import (
    SlotPlan,
    _filter_prefix,
    _iter_layers,
    _nlayer_plan,
    _resnet_plan,
    _unet_plan,
    load_state_dict,
)

Params = Dict[str, Any]


def conv_w_inv(w: np.ndarray) -> np.ndarray:
    """HWIO -> torch Conv2d OIHW (inverse of torch_import.conv_w)."""
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def deconv_w_inv(w: np.ndarray) -> np.ndarray:
    """Forward-conv HWIO kernel -> torch ConvTranspose2d IOHW
    (inverse of torch_import.deconv_w: transpose back, then unflip)."""
    return np.ascontiguousarray(
        np.asarray(w).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])


def _get_path(tree: Params, path: Tuple[str, ...]) -> Params:
    node = tree
    for p in path:
        if p not in node:
            raise KeyError(
                f"params tree has no entry {'/'.join(path)} "
                f"(missing at {p!r}); wrong --preset for this checkpoint?")
        node = node[p]
    return node


def _assign_to_template(params: Params, plan: SlotPlan,
                        sd_subset: "OrderedDict[str, np.ndarray]",
                        out: "OrderedDict[str, np.ndarray]") -> None:
    """Fill ``out``'s entries (full template names) from ``params`` —
    the order-based mirror of torch_import.assign_from_plan."""
    layers = list(_iter_layers(sd_subset))
    plan_convs = [(p, k) for p, k in plan if k in ("conv", "deconv")]
    plan_norms = [(p, k) for p, k in plan if k == "norm"]
    got_convs = [l for kind, l in layers if kind == "conv4d"]
    got_norms = [l for kind, l in layers if kind == "norm1d"]
    if len(got_convs) != len(plan_convs):
        raise ValueError(
            f"conv count mismatch: template has {len(got_convs)}, "
            f"architecture expects {len(plan_convs)}")
    # symmetric, unlike the importer's tolerant read: a template whose
    # norm layers don't match the trained config (e.g. instance-norm
    # params exported into a batch-norm template) must fail here, not
    # produce a loadable-but-wrong checkpoint
    if len(got_norms) != len(plan_norms):
        raise ValueError(
            f"norm count mismatch: template has {len(got_norms)} "
            f"parameterized norm layers, architecture expects "
            f"{len(plan_norms)} — wrong --model.norm for this template?")

    def put(name: str, arr: np.ndarray) -> None:
        arr = np.asarray(arr, dtype=np.float32)
        if out[name].shape != arr.shape:
            raise ValueError(
                f"shape mismatch at template entry {name!r}: template "
                f"{out[name].shape}, exported {arr.shape} — architecture "
                "config does not match this template")
        out[name] = arr

    for (path, kind), layer in zip(plan_convs, got_convs):
        slot = _get_path(params, path)
        w = deconv_w_inv(slot["w"]) if kind == "deconv" \
            else conv_w_inv(slot["w"])
        put(layer["names"]["weight"], w)
        if "bias" in layer["names"]:
            if "b" not in slot:
                raise ValueError(
                    f"template entry {layer['names']['bias']!r} expects a "
                    f"bias but params slot {'/'.join(path)} has none")
            put(layer["names"]["bias"], slot["b"])
        elif "b" in slot:
            raise ValueError(
                f"params slot {'/'.join(path)} has a trained bias but "
                f"template conv {layer['names']['weight']!r} has none — "
                "dropping it would corrupt the export (wrong norm for "
                "this template?)")
    for (path, _), layer in zip(plan_norms, got_norms):
        slot = _get_path(params, path)
        put(layer["names"]["weight"], slot["gamma"])
        put(layer["names"]["bias"], slot["beta"])
        if "running_mean" in layer["names"]:
            if "running_mean" in slot:
                put(layer["names"]["running_mean"], slot["running_mean"])
                put(layer["names"]["running_var"], slot["running_var"])
            else:
                # batch-norm nets trained HERE use batch statistics
                # (ops.batch_norm) and track no running stats; write
                # torch's init values (0/1) and warn — a torch user
                # must evaluate with batch stats (train-mode BN or
                # track_running_stats=False) for matching outputs.
                import logging
                logging.getLogger(__name__).warning(
                    "template expects running stats at %s but this "
                    "framework trains batch-norm with batch statistics; "
                    "writing init values (mean=0, var=1)",
                    layer["names"]["running_mean"])
                put(layer["names"]["running_mean"],
                    np.zeros_like(slot["gamma"]))
                put(layer["names"]["running_var"],
                    np.ones_like(slot["gamma"]))


def _template(sd_or_path) -> "OrderedDict[str, np.ndarray]":
    sd = (load_state_dict(sd_or_path) if isinstance(sd_or_path, str)
          else sd_or_path)
    return OrderedDict((k, np.asarray(v)) for k, v in sd.items())


def export_generator(params: Params, cfg: GenConfig, template,
                     n_blocks: Optional[int] = None,
                     n_downsampling: int = 2
                     ) -> "OrderedDict[str, np.ndarray]":
    """Fill a reference G state_dict template from our generator params.

    Mirrors torch_import.import_generator's per-architecture plans and
    prefix grouping (LocalEnhancer: 'model' = headless global trunk,
    'model{n}_1'/'model{n}_2' = enhancer branches)."""
    out = _template(template)
    name = cfg.net_g
    if name in ("resnet_9blocks", "resnet_6blocks"):
        if n_blocks is None:
            n_blocks = 9 if name.endswith("9blocks") else 6
        plan = _resnet_plan(n_downsampling, n_blocks, cfg.norm, cfg.upsample)
        _assign_to_template(params, plan, out, out)
        return out
    if name == "global":
        plan = _resnet_plan(cfg.n_downsample_global, cfg.n_blocks_global,
                            cfg.norm, cfg.upsample)
        _assign_to_template(params, plan, out, out)
        return out
    if name in ("unet_256", "unet_128"):
        num_downs = 8 if name == "unet_256" else 7
        _assign_to_template(params, _unet_plan(num_downs, cfg.norm),
                            out, out)
        return out
    if name == "local":
        gsd = _filter_prefix(out, "model.")
        gplan = _resnet_plan(cfg.n_downsample_global, cfg.n_blocks_global,
                             cfg.norm, cfg.upsample, with_tail=False)
        _assign_to_template(params["global"], gplan, gsd, out)
        for n in range(1, cfg.n_local_enhancers + 1):
            down_sd = _filter_prefix(out, f"model{n}_1.")
            up_sd = _filter_prefix(out, f"model{n}_2.")
            enh_plan_down: SlotPlan = [(("down0", "conv"), "conv")]
            if cfg.norm == "batch":
                enh_plan_down.append((("down0", "norm"), "norm"))
            enh_plan_down.append((("down1", "conv"), "conv"))
            if cfg.norm == "batch":
                enh_plan_down.append((("down1", "norm"), "norm"))
            _assign_to_template(params[f"enhancer{n}"], enh_plan_down,
                                down_sd, out)
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
            _assign_to_template(params[f"enhancer{n}"], enh_plan_up,
                                up_sd, out)
        return out
    raise ValueError(f"unknown net_g: {name}")


def export_discriminator(params: Params, cfg: DiscConfig, template
                         ) -> "OrderedDict[str, np.ndarray]":
    """Fill a reference D state_dict template from our discriminator
    params (both multiscale naming conventions, scale order reversed —
    see torch_import.import_discriminator)."""
    import re
    out = _template(template)
    if cfg.net_d == "n_layers":
        _assign_to_template(params, _nlayer_plan(cfg.n_layers, cfg.norm),
                            out, out)
        return out
    if cfg.net_d == "pixel":
        _assign_to_template(params, _nlayer_plan(1, cfg.norm), out, out)
        return out
    if cfg.net_d == "multiscale":
        scale_keys = sorted({m.group(1) for m in
                             (re.match(r"(scale\d+)_", k) for k in out)
                             if m})
        if scale_keys:
            for i, sk in enumerate(sorted(scale_keys, reverse=True)):
                ssd = _filter_prefix(out, sk + "_")
                _assign_to_template(params[f"scale{i}"],
                                    _nlayer_plan(cfg.n_layers, cfg.norm),
                                    ssd, out)
        else:
            for i in range(cfg.num_d):
                ssd = _filter_prefix(out, f"layer{cfg.num_d - 1 - i}")
                _assign_to_template(params[f"scale{i}"],
                                    _nlayer_plan(cfg.n_layers, cfg.norm),
                                    ssd, out)
        return out
    raise ValueError(f"unknown net_d: {cfg.net_d}")


def save_torch_state_dict(sd: "OrderedDict[str, np.ndarray]",
                          path: str) -> None:
    """torch.save an exported state_dict (tensors, reference format)."""
    import torch
    torch.save(OrderedDict((k, torch.from_numpy(np.asarray(v)))
                           for k, v in sd.items()), path)
