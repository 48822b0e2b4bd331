#!/usr/bin/env python
"""Example: serve many IR video streams on one chip.

Two deployment shapes for the same serving step (docs/DESIGN.md §6):

1. **Multi-stream server** — N independent streams share one compiled
   batched generator step; each stream keeps its own previous-frame
   carry in HBM and can join, leave, or skip ticks without retracing.
   8 streams/chip is the measured throughput knee: ~1.45x one
   stream's rate in aggregate (429 vs 296 fps at 512p bf16; 479 with
   --infer.quant int8_mixed). More streams are served by chunked
   round-robin over the carry pool — the compiled batch stays at 8.

2. **Sealed artifact** — the same step exported to a one-file
   `.ir2rgb` (StableHLO + weights); `load_serving_artifact` serves it
   with no framework model code importable at all.

    python examples/multistream_serve.py --run checkpoints/temporal_512 \
        --streams /data/camA /data/camB /data/camC --out /tmp/rgb
    python examples/multistream_serve.py --artifact model.ir2rgb \
        --streams /data/camA --out /tmp/rgb
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run", help="run dir (with config.json + ckpt/)")
    p.add_argument("--artifact", help=".ir2rgb artifact (instead of --run)")
    p.add_argument("--streams", nargs="+", required=True,
                   help="one frame folder per stream")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from ir2rgb_tpu.data.folder import make_dataset

    def load_feeds(hw=None):
        feeds = []
        for d in args.streams:
            frames = []
            for f in make_dataset(d):
                img = Image.open(f).convert("RGB")
                if hw is not None and img.size != (hw[1], hw[0]):
                    img = img.resize((hw[1], hw[0]), Image.BICUBIC)  # PIL size is (w, h)
                frames.append(np.asarray(img))
            feeds.append(frames)
        return feeds

    os.makedirs(args.out, exist_ok=True)

    if args.artifact:
        # artifact path: the exported program has a FIXED batch shape.
        # batch == 1 serves streams one-by-one; batch > 1 (exported with
        # --batch N) serves one stream per slot, stacked each tick.
        from ir2rgb_tpu.infer import load_serving_artifact
        art = load_serving_artifact(args.artifact)
        feeds = load_feeds(tuple(art.meta["frame_hw"]))
        if art.batch == 1:
            for si, frames in enumerate(feeds):
                art.reset()
                for t, rgb in enumerate(art.stream(iter(frames))):
                    Image.fromarray(rgb).save(
                        os.path.join(args.out, f"s{si}_f{t:05d}.png"))
            return 0
        if len(feeds) > art.batch:
            print(f"artifact has {art.batch} slots < {len(feeds)} "
                  "streams; re-export with --batch", file=sys.stderr)
            return 1
        art.reset()
        n_ticks = max(len(f) for f in feeds)
        for t in range(n_ticks):
            # pad finished/short streams by repeating their last frame
            # (the fixed-shape program has no skip mask; extra outputs
            # are simply not saved)
            tile = np.stack(
                [feeds[i % len(feeds)][min(t, len(feeds[i % len(feeds)]) - 1)]
                 for i in range(art.batch)])
            outs = art.push(tile)
            for i in range(len(feeds)):
                if t < len(feeds[i]):
                    Image.fromarray(outs[i]).save(
                        os.path.join(args.out, f"s{i}_f{t:05d}.png"))
        return 0

    import jax

    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.config import load_config
    from ir2rgb_tpu.infer import MultiStreamServer
    from ir2rgb_tpu.train import create_model

    cfg = load_config(os.path.join(args.run, "config.json"))
    model = create_model(cfg, steps_per_epoch=1)
    ckpt = CheckpointManager(os.path.join(args.run, "ckpt"))
    state = ckpt.restore(ckpt.latest_step())
    g = state["g_params"] if isinstance(state, dict) else state.g_params

    # serve at the run's trained geometry (the generators need H/W
    # divisible by their stride-2 stacks — see nn/generators.py)
    h = w = cfg.data.crop_size
    feeds = load_feeds((h, w))
    srv = MultiStreamServer(model, g, (h, w),
                            n_slots=max(len(feeds), 1))
    sids = [srv.open() for _ in feeds]
    t0, served = time.perf_counter(), 0

    def tick_feed():
        for t in range(max(len(f) for f in feeds)):
            yield {sids[i]: feeds[i][t]
                   for i in range(len(feeds)) if t < len(feeds[i])}

    for t, outs in enumerate(srv.ticks(tick_feed())):
        for i, sid in enumerate(sids):
            if sid in outs:
                Image.fromarray(outs[sid]).save(
                    os.path.join(args.out, f"s{i}_f{t:05d}.png"))
                served += 1
    dt = time.perf_counter() - t0
    print(f"{served} frames / {len(feeds)} streams in {dt:.2f}s "
          f"({served / dt:.1f} aggregate fps incl. host IO)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
