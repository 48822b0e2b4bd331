#!/usr/bin/env python
"""Post-training-quantization quality on TRAINED weights.

DESIGN.md §6b's quality record is measured on He-random weights with
the hedge "harsher than trained weights — arbitrary IN statistics";
this script closes that hedge with data: restore a trained generator
from a run directory (the training soak's, normally), translate
held-out clips under each quant mode, and report

- dB vs the fp output of the SAME weights (the quantization error the
  §6b record tracks), and
- PSNR vs ground-truth RGB + temporal flicker (what a user serving the
  checkpoint actually loses).

    python scripts/quant_trained_eval.py <run_dir> <eval_dataroot> \
        [mode,mode,...] [--epoch LABEL] [--ema]

Modes default to none,int8,int8_mixed,int8_w.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def load_clips(dataroot: str, size: int, n_videos: int):
    from PIL import Image

    vids = sorted(os.listdir(os.path.join(dataroot, "A")))[:n_videos]
    clips = []
    for vid in vids:
        frames_a, frames_b = [], []
        names = sorted(os.listdir(os.path.join(dataroot, "A", vid)))
        for f in names:
            for sub, acc in (("A", frames_a), ("B", frames_b)):
                im = Image.open(os.path.join(dataroot, sub, vid, f))
                a = np.asarray(im, np.float32) / 127.5 - 1.0
                if a.ndim == 2:
                    a = a[..., None]
                h, w = a.shape[:2]
                y0, x0 = (h - size) // 2, (w - size) // 2
                acc.append(a[y0:y0 + size, x0:x0 + size])
        clips.append((np.stack(frames_a)[:, None],
                      np.stack(frames_b)[:, None]))
    return clips


def main() -> None:
    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.config import load_config
    from ir2rgb_tpu.infer.metrics import flicker, psnr
    from ir2rgb_tpu.infer.stream import translate_clip
    from ir2rgb_tpu.train import create_model

    args = [a for a in sys.argv[1:]]
    use_ema = "--ema" in args
    if use_ema:
        args.remove("--ema")
    epoch = None
    if "--epoch" in args:
        epoch = args[args.index("--epoch") + 1]
        del args[args.index("--epoch"):args.index("--epoch") + 2]
    run_dir, dataroot = args[0], args[1]
    modes = (args[2].split(",") if len(args) > 2
             else ["none", "int8", "int8_mixed", "int8_w"])

    cfg = load_config(os.path.join(run_dir, "config.json"))
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    if epoch is not None:
        step = ckpt.step_for_label(epoch)
    else:
        step = max(ckpt.all_steps())
    state = ckpt.restore(step)
    kind = "ema_g" if use_ema else "g_params"
    g = (state.get(kind) if isinstance(state, dict)
         else getattr(state, kind, None))
    if not g:
        raise SystemExit(f"no {kind} in checkpoint step {step}")
    if cfg.model.compute_dtype == "bf16":
        g = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, g)

    clips = load_clips(dataroot, cfg.data.crop_size, 4)

    outs = {}
    for mode in modes:
        mcfg = cfg.replace(infer=dataclasses.replace(cfg.infer,
                                                     quant=mode))
        model = create_model(mcfg, steps_per_epoch=1)
        translate = jax.jit(lambda p, a, m=model: translate_clip(m, p, a))
        mode_out = [np.asarray(translate(g, jnp.asarray(a)),
                               np.float32) for a, _ in clips]
        outs[mode] = mode_out
        vs_gt = [float(psnr(jnp.asarray(o), jnp.asarray(b)))
                 for o, (_, b) in zip(mode_out, clips)]
        fl = [float(flicker(jnp.asarray(o)[:, 0])) for o in mode_out]
        row = {"mode": mode, "weights": kind, "step": step,
               "psnr_vs_gt_db": round(float(np.mean(vs_gt)), 2),
               "flicker": round(float(np.mean(fl)), 4)}
        if mode != "none" and "none" in outs:
            vs_fp = [float(psnr(jnp.asarray(o), jnp.asarray(r)))
                     for o, r in zip(mode_out, outs["none"])]
            row["psnr_vs_fp_db"] = round(float(np.mean(vs_fp)), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
