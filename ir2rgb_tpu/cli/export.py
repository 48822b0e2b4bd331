"""Export entry point: seal a trained generator into a ``.ir2rgb``
serving artifact (StableHLO program + weights + geometry — see
infer/export.py). The artifact serves via ``load_serving_artifact``
with no model code, config system, or checkpoint machinery behind it.

    python -m ir2rgb_tpu.cli.export --preset temporal_512 \
        --train.name run1 --train.checkpoints_dir ckpts \
        --out run1.ir2rgb [--batch 4] [--platforms tpu,cpu]

``--torch_g model.pth`` exports straight from a reference torch
checkpoint (importer parity mode, as in cli/infer.py).
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    from ir2rgb_tpu.checkpoint import CheckpointManager, import_generator
    from ir2rgb_tpu.config import parse_cli
    from ir2rgb_tpu.infer import export_serving_artifact
    from ir2rgb_tpu.train import create_model

    argv = list(sys.argv[1:] if argv is None else argv)

    def _pop(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i:i + 2]
            return val
        return default

    torch_g = _pop("--torch_g")
    out = _pop("--out")
    batch_flag = _pop("--batch")
    slots = _pop("--slots")  # multi-stream artifact (per-slot carries)
    if batch_flag is not None and slots is not None:
        raise SystemExit("--batch and --slots are mutually exclusive "
                         "(--slots IS the multi-stream batch)")

    def _positive_int(flag: str, val: str) -> int:
        try:
            n = int(val)
        except ValueError:
            raise SystemExit(f"{flag} expects an integer, got {val!r}")
        if n < 1:
            raise SystemExit(f"{flag} must be >= 1, got {n}")
        return n

    batch = (_positive_int("--batch", batch_flag)
             if batch_flag is not None else 1)
    if slots is not None:
        slots = _positive_int("--slots", slots)
    platforms = tuple(_pop("--platforms", "tpu,cpu").split(","))
    size_flag = _pop("--size")
    cfg = parse_cli(argv)
    if out is None:
        out = os.path.join(cfg.run_dir(), f"{cfg.train.name}.ir2rgb")

    # cfg.infer.quant seals the QUANTIZED serving program into the
    # artifact: the model traces its serving forward under its own quant
    # mode (nn/quant.py) and the StableHLO captures the int8 convs
    model = create_model(cfg, steps_per_epoch=1)
    if torch_g is not None:
        g_params = import_generator(torch_g, model.gen_cfg)
    else:
        ckpt = CheckpointManager(os.path.join(cfg.run_dir(), "ckpt"))
        step = ckpt.step_for_label(cfg.infer.which_epoch)
        state = ckpt.restore(step)
        g_params = state["g_params"] if isinstance(state, dict) else \
            state.g_params

    # The artifact is sealed at ONE static geometry. Crop-style training
    # serves at crop_size x crop_size; scale_width/none runs run at the
    # dataset's native geometry, which export can't probe (no dataroot
    # needed here) — require --size HxW for those, or accept it as an
    # override anywhere (e.g. exporting a 720x1280 serving program).
    if size_flag is not None:
        parts = size_flag.lower().split("x")
        size_hw = ((int(parts[0]), int(parts[1])) if len(parts) == 2
                   else (int(parts[0]), int(parts[0])))
    elif "crop" in cfg.data.preprocess:
        size_hw = (cfg.data.crop_size, cfg.data.crop_size)
    else:
        raise SystemExit(
            f"--data.preprocess {cfg.data.preprocess} serves at the "
            f"dataset's native geometry, which export cannot infer; "
            f"pass --size HxW (the frame size the artifact will serve)")
    if slots is not None:
        # multi-stream artifact: the batched tick with per-slot carries
        # + join/leave masks; serve with ir2rgb-serve --artifact (no
        # model code, no trace at daemon start)
        from ir2rgb_tpu.infer import export_multistream_artifact
        export_multistream_artifact(model, g_params, size_hw, out,
                                    n_slots=slots,
                                    platforms=platforms)
        kind = f"multistream slots {slots}"
    else:
        export_serving_artifact(model, g_params, size_hw, out,
                                batch=batch, platforms=platforms)
        kind = f"batch {batch}"
    print(f"exported {out} ({os.path.getsize(out)} bytes, "
          f"{size_hw[0]}x{size_hw[1]} {kind}, "
          f"platforms {','.join(platforms)})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
