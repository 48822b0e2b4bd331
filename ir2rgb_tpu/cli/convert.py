"""Checkpoint conversion CLI.

- torch -> ours: import a reference ``.pth`` generator/discriminator
  state_dict into an Orbax params checkpoint (the parity on-ramp,
  SURVEY.md §3.4 rebuild note);
- vgg19: convert torchvision's ``vgg19-*.pth`` to the npz consumed by the
  perceptual loss (ir2rgb_tpu/nn/vgg.py).

    python -m ir2rgb_tpu.cli.convert g --pth latest_net_G.pth \
        --preset pix2pixhd_512 --out ./imported_g
    python -m ir2rgb_tpu.cli.convert vgg19 --pth vgg19.pth --out vgg19.npz
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser("ir2rgb-convert")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("g", "d"):
        sp = sub.add_parser(name)
        sp.add_argument("--pth", required=True)
        sp.add_argument("--preset", default="resnet9_256")
        sp.add_argument("--out", required=True)
    spv = sub.add_parser("vgg19")
    spv.add_argument("--pth", required=True)
    spv.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.cmd == "vgg19":
        from ir2rgb_tpu.checkpoint import convert_vgg19_pth
        convert_vgg19_pth(args.pth, args.out)
        print(f"wrote {args.out}")
        return 0

    import jax
    from ir2rgb_tpu.checkpoint import (
        import_discriminator,
        import_generator,
        save_train_state,
    )
    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.train.model import create_model

    cfg = PRESETS[args.preset]
    model = create_model(cfg, steps_per_epoch=1)
    if args.cmd == "g":
        params = import_generator(args.pth, model.gen_cfg)
    else:
        params = import_discriminator(args.pth, model.disc_cfg)
    save_train_state(args.out, 0, jax.device_get(params))
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"imported {n:,} params -> {args.out}/0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
