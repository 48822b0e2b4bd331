#!/usr/bin/env python
"""Example: translate a camera recording through the serving daemon.

Ties the round-3 serving pieces together end-to-end (docs/DESIGN.md §6):
an MJPEG/AVI recording (the common thermal-camera format) streams
through a running ``ir2rgb-serve`` daemon over TCP and the translated
frames assemble back into an MJPEG/AVI next to it — no ffmpeg, no frame
folders, no model code in this process.

    # terminal 1: the daemon (weights stay loaded, step stays compiled)
    ir2rgb-serve --preset temporal_512 --train.name run1 \
        --infer.serve_port 7788

    # terminal 2+: one cheap client per camera file
    python examples/serve_video.py --port 7788 \
        --in /data/cam0.avi --out /tmp/cam0_rgb.avi [--jpeg]

Several of these clients running concurrently batch into shared device
steps on the daemon side (that is the point — see the multi-stream
ladder in DESIGN.md §6).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--in", dest="src", required=True,
                   help="input MJPEG/AVI recording")
    p.add_argument("--out", required=True, help="output AVI path")
    p.add_argument("--jpeg", action="store_true",
                   help="JPEG-encode frames on the wire (thin links)")
    args = p.parse_args()

    # only the light IO pieces are imported — the package __init__s are
    # lazy (PEP 562), so neither jax nor any model code loads in this
    # process (numpy + libjpeg only; ~70 ms import)
    from ir2rgb_tpu.data.video import avi_index, decode_mixed_batch, \
        frame_paths
    from ir2rgb_tpu.infer.server import FrameClient
    from ir2rgb_tpu.obs.video import MJPEGAviWriter

    idx = avi_index(args.src)
    with FrameClient(args.host, args.port, jpeg=args.jpeg) as client:
        h, w = client.frame_hw
        gray = client.in_nc == 1

        def frames():
            paths = frame_paths(args.src)
            for k in range(0, len(paths), 16):  # decode in small batches
                for f in decode_mixed_batch(paths[k:k + 16], h, w,
                                            gray=gray):
                    yield f[..., 0] if gray else f

        t0 = time.perf_counter()
        n = 0
        with MJPEGAviWriter(args.out, fps=idx.fps or 30.0) as out:
            # FrameClient.stream pipelines: frame t+1 is on the wire
            # while the daemon computes t
            for rgb in client.stream(frames()):
                out.add(rgb)
                n += 1
        dt = time.perf_counter() - t0
    print(f"{n} frames -> {args.out}  ({n / dt:.1f} fps end-to-end)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
