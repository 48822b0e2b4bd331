#!/usr/bin/env python
"""Example: real-time IR->RGB video streaming (the serving path).

Translates a folder of IR frames sequentially at batch 1 with the
on-device previous-frame carry (temporal mode) or frame-independently
(single-frame models), writing RGB PNGs. This is the minimal production
serving loop; see docs/DESIGN.md §6-7.

    python examples/stream_video.py --frames /data/ir_frames \
        --run checkpoints/temporal_256 --out /tmp/rgb_out
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", required=True, help="folder of IR frames")
    p.add_argument("--run", required=True, help="run dir (with config.json)")
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=None,
                   help="inference resolution (default: run's crop_size)")
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    import jax

    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.config import load_config
    from ir2rgb_tpu.data.folder import make_dataset
    from ir2rgb_tpu.data.native import decode_batch
    from ir2rgb_tpu.infer import StreamingGenerator, tensor2im
    from ir2rgb_tpu.train import create_model

    cfg = load_config(os.path.join(args.run, "config.json"))
    size = args.size or cfg.data.crop_size
    model = create_model(cfg, steps_per_epoch=1)
    state = CheckpointManager(os.path.join(args.run, "ckpt")).restore()
    g_params = (state["g_params"] if isinstance(state, dict)
                else state.g_params)

    stream = StreamingGenerator(model, g_params, (size, size))
    paths = make_dataset(args.frames)
    os.makedirs(args.out, exist_ok=True)

    t0 = time.perf_counter()

    def decoded():
        for path in paths:
            # uint8 straight to the device: normalization/quantization
            # run on-chip so the wire carries 1 byte/px each way
            yield decode_batch([path], size, size,
                               gray=cfg.model.input_nc == 1)[0]

    # StreamingGenerator.stream pipelines H2D + dispatch of frame t
    # ahead of the D2H of frame t-1
    for path, rgb in zip(paths, stream.stream(decoded())):
        name = os.path.splitext(os.path.basename(path))[0] + "_rgb.png"
        Image.fromarray(rgb).save(os.path.join(args.out, name))
    dt = time.perf_counter() - t0
    print(f"{len(paths)} frames in {dt:.2f}s "
          f"({len(paths) / max(dt, 1e-9):.1f} fps end-to-end incl. "
          f"decode + PNG encode)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
