"""Evaluation entry point: PSNR/SSIM (+ flicker for sequences) between a
generated-results folder and ground truth — the reference family's
evaluation protocol (SURVEY.md §4: outputs scored against ground-truth
RGB), packaged as a CLI.

    python -m ir2rgb_tpu.cli.evaluate --generated DIR --target DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 127.5 - 1.0


def main(argv=None) -> int:
    from ir2rgb_tpu.data.folder import make_dataset
    from ir2rgb_tpu.infer import flicker, psnr, ssim

    p = argparse.ArgumentParser("ir2rgb-eval")
    p.add_argument("--generated", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--json_out", default=None)
    args = p.parse_args(argv)

    gen_paths = make_dataset(args.generated)
    tgt_paths = make_dataset(args.target)
    n = min(len(gen_paths), len(tgt_paths))
    if n == 0:
        print("no images found", file=sys.stderr)
        return 1

    psnrs, ssims, gen_frames = [], [], []
    for g, t in zip(gen_paths[:n], tgt_paths[:n]):
        gi, ti = _load(g), _load(t)
        if gi.shape != ti.shape:
            print(f"skip shape mismatch: {g} {gi.shape} vs {t} {ti.shape}",
                  file=sys.stderr)
            continue
        psnrs.append(float(psnr(gi, ti)))
        ssims.append(float(ssim(gi, ti)))
        gen_frames.append(gi)

    if not psnrs:
        # np.mean([]) would print NaN (invalid strict JSON) and exit 0
        # as if evaluation succeeded
        print("no comparable pairs (every pair skipped for shape "
              "mismatch)", file=sys.stderr)
        return 1

    # flicker needs one stackable (T, H, W, C) clip; mixed result sizes
    # (e.g. several videos at different resolutions) can't be scored
    same_shape = all(f.shape == gen_frames[0].shape for f in gen_frames)
    if not same_shape:
        print("mixed generated-frame sizes: skipping flicker metric",
              file=sys.stderr)
    result = {
        "frames": len(psnrs),
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_std": float(np.std(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "flicker": float(flicker(np.stack(gen_frames)))
        if len(gen_frames) > 1 and same_shape else None,
    }
    print(json.dumps(result, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(result, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
