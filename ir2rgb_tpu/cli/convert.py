"""Checkpoint conversion CLI.

- torch -> ours: import a reference ``.pth`` generator/discriminator
  state_dict into an Orbax params checkpoint (the parity on-ramp,
  SURVEY.md §3.4 rebuild note);
- ours -> torch: export a trained run's G/D back to a reference-layout
  ``.pth`` (template-fill — see checkpoint/torch_export.py), so a
  TPU-trained checkpoint deploys into an unchanged torch stack;
- vgg19: convert torchvision's ``vgg19-*.pth`` to the npz consumed by the
  perceptual loss (ir2rgb_tpu/nn/vgg.py).

    python -m ir2rgb_tpu.cli.convert g --pth latest_net_G.pth \
        --preset pix2pixhd_512 --out ./imported_g
    python -m ir2rgb_tpu.cli.convert export-g --run ./ckpts/exp1 \
        --epoch latest --template ref_net_G.pth --preset pix2pixhd_512 \
        --out 200_net_G.pth
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
    for name in ("export-g", "export-d"):
        sp = sub.add_parser(name)
        sp.add_argument("--run", required=True,
                        help="training run dir (contains ckpt/)")
        sp.add_argument("--epoch", default="latest",
                        help="epoch label or step (reference --which_epoch)")
        sp.add_argument("--template", required=True,
                        help="reference .pth of the same architecture "
                             "(any checkpoint, or torch.save of a freshly "
                             "constructed reference net's state_dict)")
        sp.add_argument("--preset", default="",
                        help="override architecture; default: the run's "
                             "own config.json")
        sp.add_argument("--net", default="",
                        help="cycle_gan runs hold two nets per side: "
                             "G_A (A->B, default) | G_B for export-g, "
                             "D_A (judges B) | D_B for export-d")
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

    if args.cmd in ("export-g", "export-d"):
        import os

        import jax
        from ir2rgb_tpu.checkpoint import (
            CheckpointManager,
            export_discriminator,
            export_generator,
            save_torch_state_dict,
        )
        from ir2rgb_tpu.config import PRESETS, load_config
        from ir2rgb_tpu.train.model import create_model

        if args.preset:
            cfg = PRESETS[args.preset]
        else:
            cfg_path = os.path.join(args.run, "config.json")
            if not os.path.exists(cfg_path):
                p.error(f"{cfg_path} not found; pass --preset")
            cfg = load_config(cfg_path)
        model = create_model(cfg, steps_per_epoch=1)
        ckpt = CheckpointManager(os.path.join(args.run, "ckpt"))
        step = ckpt.step_for_label(args.epoch)
        state = ckpt.restore(step)
        cycle = cfg.model.model == "cycle_gan"
        if args.cmd == "export-g":
            params = (state["g_params"] if isinstance(state, dict)
                      else state.g_params)
            gen_cfg = model.gen_cfg
            if cycle:
                net = args.net or "G_A"
                if net not in ("G_A", "G_B"):
                    p.error("--net must be G_A or G_B for export-g on a "
                            "cycle_gan run")
                params = params[net]
                gen_cfg = (model.gen_cfg if net == "G_A"
                           else model.gen_cfg_b)
            out_sd = export_generator(jax.device_get(params),
                                      gen_cfg, args.template)
        else:
            params = (state["d_params"] if isinstance(state, dict)
                      else state.d_params)
            disc_cfg = model.disc_cfg
            if cycle:
                net = args.net or "D_A"
                if net not in ("D_A", "D_B"):
                    p.error("--net must be D_A or D_B for export-d on a "
                            "cycle_gan run")
                params = params[net]
                disc_cfg = (model.disc_cfg if net == "D_A"
                            else model.disc_cfg_b)
            out_sd = export_discriminator(jax.device_get(params),
                                          disc_cfg, args.template)
        save_torch_state_dict(out_sd, args.out)
        n = sum(int(v.size) for v in out_sd.values())
        print(f"exported {n:,} params (epoch {args.epoch}, step {step}) "
              f"-> {args.out}")
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
