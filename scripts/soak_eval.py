#!/usr/bin/env python
"""Checkpoint-trajectory evaluation for a training soak run (round-4
verdict item 8: GAN stability past the smoke horizon needs committed
evidence — loss curves alone don't show output quality drifting).

For every epoch label saved by the soak run, restores the generator
(and its EMA shadow when present), translates held-out synthetic clips
with ONE compiled ``translate_clip`` program (restores swap weights,
never retrace), and prints a JSON row per epoch: PSNR / SSIM vs ground
truth and the temporal flicker metric. Run after the soak:

    python scripts/soak_eval.py <run_dir> <eval_dataroot> [n_videos]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from PIL import Image

    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.config import load_config
    from ir2rgb_tpu.infer.metrics import flicker, psnr, ssim
    from ir2rgb_tpu.infer.stream import translate_clip
    from ir2rgb_tpu.train import create_model

    run_dir = sys.argv[1]
    dataroot = sys.argv[2]
    n_videos = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    cfg = load_config(os.path.join(run_dir, "config.json"))
    model = create_model(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))

    size = cfg.data.crop_size
    vids = sorted(os.listdir(os.path.join(dataroot, "A")))[:n_videos]

    def load_clip(vid):
        frames_a, frames_b = [], []
        names = sorted(os.listdir(os.path.join(dataroot, "A", vid)))
        for f in names:
            for sub, acc in (("A", frames_a), ("B", frames_b)):
                im = Image.open(os.path.join(dataroot, sub, vid, f))
                a = np.asarray(im, np.float32) / 127.5 - 1.0
                if a.ndim == 2:  # grayscale IR (input_nc=1)
                    a = a[..., None]
                # center-crop to the train geometry
                h, w = a.shape[:2]
                y0, x0 = (h - size) // 2, (w - size) // 2
                acc.append(a[y0:y0 + size, x0:x0 + size])
        return (np.stack(frames_a)[:, None], np.stack(frames_b)[:, None])

    clips = [load_clip(v) for v in vids]

    translate = jax.jit(
        lambda p, a: translate_clip(model, p, a))

    with open(os.path.join(run_dir, "ckpt", "epochs.json")) as fh:
        labels = sorted(json.load(fh).items(), key=lambda kv: kv[1])

    def to_bf(p):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    for label, step in labels:
        state = ckpt.restore(step)
        rows = {}
        for kind in ("g_params", "ema_g"):
            g = (state.get(kind) if isinstance(state, dict)
                 else getattr(state, kind, None))
            if not g:
                continue
            g_params = to_bf(g) if cfg.model.compute_dtype == "bf16" else g
            ps, ss_, fl = [], [], []
            for a_seq, b_seq in clips:
                out = translate(g_params, jnp.asarray(a_seq))
                out32 = jnp.asarray(out, jnp.float32)
                b = jnp.asarray(b_seq)
                ps.append(float(psnr(out32, b)))
                ss_.append(float(ssim(
                    out32.reshape(-1, *out32.shape[2:]),
                    b.reshape(-1, *b.shape[2:]))))
                fl.append(float(flicker(out32[:, 0])))
            rows[kind] = {"psnr": round(float(np.mean(ps)), 2),
                          "ssim": round(float(np.mean(ss_)), 4),
                          "flicker": round(float(np.mean(fl)), 4)}
        print(json.dumps({"epoch": label, "step": step, **rows}),
              flush=True)


if __name__ == "__main__":
    main()
