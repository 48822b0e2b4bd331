#!/usr/bin/env python
"""Synthetic IR->RGB video dataset for the training soak (round-4
verdict item 8: demonstrate GAN stability past the smoke horizon —
through the unfreeze boundary and the lr-decay phase — with committed
loss/quality trajectories).

The reference family trains on paired IR/RGB video (SURVEY.md §2.3);
no real dataset exists in this no-network environment, so the soak uses
a generated one whose IR->RGB mapping is deterministic and therefore
learnable:

- RGB scenes: moving anti-aliased shapes (circles/boxes, constant
  velocity, edge bounce) drawn from an 8-color palette with distinct
  luminances, over a per-video smooth background, with a slow global
  illumination drift (exercises the temporal carry).
- IR = channel mix (0.6R+0.3G+0.1B) through a gamma of 0.8 of the SAME
  drifted RGB frame — a pure function of the target, and invertible on
  this palette, so the generator can in principle reach high PSNR.

Layout (matches data/folder.py::_resolve_ab_dirs candidates + what
scripts/soak_eval.py reads):

    <root>/A/<vid>/f###.png   8-bit grayscale IR
    <root>/B/<vid>/f###.png   8-bit RGB

Usage:
    python scripts/make_soak_data.py <root> [--videos 24] [--frames 33]
        [--size 572] [--seed 0]
"""

import argparse
import os

import numpy as np

# distinct luminances (0.6R+0.3G+0.1B in [0,1]) so IR->RGB is 1:1
PALETTE = np.array([
    [230, 40, 40],    # red
    [40, 200, 60],    # green
    [60, 80, 230],    # blue
    [240, 200, 40],   # yellow
    [200, 60, 200],   # magenta
    [40, 220, 220],   # cyan
    [250, 250, 250],  # white
    [140, 90, 40],    # brown
], np.float32) / 255.0


def render_video(rng: np.random.RandomState, n_frames: int, size: int):
    """Returns (ir_frames, rgb_frames) uint8 arrays [T,H,W] / [T,H,W,3]."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    # per-video background: smooth gradient + low-frequency texture
    gdir = rng.rand(2) * 2 - 1
    phase = rng.rand(2) * 2 * np.pi
    freq = 2 + rng.rand(2) * 3
    base = (0.25 + 0.15 * (gdir[0] * xx + gdir[1] * yy)
            + 0.08 * np.sin(freq[0] * 2 * np.pi * xx + phase[0])
            * np.sin(freq[1] * 2 * np.pi * yy + phase[1]))
    bg_color = PALETTE[rng.randint(len(PALETTE))] * 0.3 + 0.2
    bg = np.clip(base[..., None] * bg_color[None, None] * 2.5, 0, 1)

    n_shapes = rng.randint(6, 10)
    pos = rng.rand(n_shapes, 2) * 0.8 + 0.1
    vel = (rng.rand(n_shapes, 2) * 2 - 1) * 0.02
    rad = rng.rand(n_shapes) * 0.08 + 0.04
    kind = rng.randint(0, 2, n_shapes)          # 0 circle, 1 box
    color = PALETTE[rng.randint(0, len(PALETTE), n_shapes)]

    irs, rgbs = [], []
    aa = 1.5 / size                              # anti-alias band
    for t in range(n_frames):
        frame = bg.copy()
        for s in range(n_shapes):
            cy, cx = pos[s]
            if kind[s] == 0:
                d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) - rad[s]
            else:
                d = np.maximum(np.abs(yy - cy), np.abs(xx - cx)) - rad[s]
            alpha = np.clip((aa - d) / (2 * aa), 0, 1)[..., None]
            frame = frame * (1 - alpha) + color[s][None, None] * alpha
        # slow illumination drift — the temporal signal
        drift = 1.0 + 0.05 * np.sin(2 * np.pi * t / n_frames + phase[0])
        rgb = np.clip(frame * drift, 0, 1)
        ir = (0.6 * rgb[..., 0] + 0.3 * rgb[..., 1]
              + 0.1 * rgb[..., 2]) ** 0.8
        rgbs.append((rgb * 255).astype(np.uint8))
        irs.append((np.clip(ir, 0, 1) * 255).astype(np.uint8))
        pos += vel
        for ax in range(2):
            bounce = (pos[:, ax] < 0.05) | (pos[:, ax] > 0.95)
            vel[bounce, ax] *= -1
    return np.stack(irs), np.stack(rgbs)


def main() -> None:
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--size", type=int, default=572)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for v in range(args.videos):
        rng = np.random.RandomState(args.seed * 10000 + v)
        irs, rgbs = render_video(rng, args.frames, args.size)
        vid = f"vid{v:03d}"
        for sub, arr in (("A", irs), ("B", rgbs)):
            d = os.path.join(args.root, sub, vid)
            os.makedirs(d, exist_ok=True)
            for t in range(arr.shape[0]):
                Image.fromarray(arr[t]).save(
                    os.path.join(d, f"f{t:03d}.png"))
        print(f"{vid}: {args.frames} frames", flush=True)


if __name__ == "__main__":
    main()
