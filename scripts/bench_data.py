#!/usr/bin/env python
"""Data-pipeline throughput: native C++ thread-pool decoder vs PIL.

The loader's host path (SURVEY.md §2.3 — the reference burned nThreads
Python workers on PIL decode) must outrun the device: at 23.5 train
steps/s (512², b1) the decoder needs >23.5 frames/s/host with headroom.

    python scripts/bench_data.py [n_images] [size]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from ir2rgb_tpu.data.native import (
        _decode_batch_pil,
        _decode_ids_pil,
        decode_batch,
        decode_ids_batch,
        encode_png_batch,
        native_available,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.RandomState(0)
    imgs = (rng.rand(n, size, size, 3) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        paths = [os.path.join(d, f"f{i:04d}.png") for i in range(n)]
        t0 = time.perf_counter()
        encode_png_batch(paths, imgs)
        t_enc = time.perf_counter() - t0

        rows = []
        for name, fn in [
            ("native", lambda: decode_batch(paths, size, size)),
            ("pil", lambda: _decode_batch_pil(paths, size, size, False)),
        ]:
            if name == "native" and not native_available():
                continue
            fn()  # warm page cache
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            assert out.shape == (n, size, size, 3)
            rows.append({"path": name, "images": n, "size": size,
                         "ms_per_image": round(best / n * 1e3, 3),
                         "images_per_sec": round(n / best, 1)})
        rows.append({"path": "native_encode", "images": n, "size": size,
                     "ms_per_image": round(t_enc / n * 1e3, 3),
                     "images_per_sec": round(n / t_enc, 1)})

        # id-map decode (--instance_feat / --label_nc input path):
        # gray id PNGs, NEAREST resize, int32 out
        from PIL import Image
        id_paths = [os.path.join(d, f"ids{i:04d}.png") for i in range(n)]
        ids = rng.randint(0, 200, (n, size, size)).astype(np.uint8)
        for p, a in zip(id_paths, ids):
            Image.fromarray(a).save(p)
        for name, fn in [
            ("native_ids", lambda: decode_ids_batch(id_paths, size, size)),
            ("pil_ids", lambda: _decode_ids_pil(id_paths, size, size)),
        ]:
            if name == "native_ids" and not native_available():
                continue
            fn()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            assert out.shape == (n, size, size)
            rows.append({"path": name, "images": n, "size": size,
                         "ms_per_image": round(best / n * 1e3, 3),
                         "images_per_sec": round(n / best, 1)})
        # MJPEG/AVI ingest (data/video.py): one container, buffered span
        # reads + in-memory JPEG thread-pool decode — the video-dataroot
        # path vs per-file decode above
        from ir2rgb_tpu.data.video import decode_mixed_batch, frame_paths
        from ir2rgb_tpu.obs.video import MJPEGAviWriter
        avi = os.path.join(d, "clip.avi")
        with MJPEGAviWriter(avi, fps=30, quality=92) as w:
            for im in imgs:
                w.add(im)
        vp = frame_paths(avi)
        decode_mixed_batch(vp, size, size)  # warm cache + index
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = decode_mixed_batch(vp, size, size)
            best = min(best, time.perf_counter() - t0)
        assert out.shape == (n, size, size, 3)
        rows.append({"path": "native_avi", "images": n, "size": size,
                     "ms_per_image": round(best / n * 1e3, 3),
                     "images_per_sec": round(n / best, 1)})
        for r in rows:
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
