#!/usr/bin/env python
"""End-to-end serving-loop bench: host frames in, uint8 RGB out.

Measures the REAL serve path (unlike /bench.py, which times the pure
device compute with the in-compiled-loop slope method): per-frame host
prep + H2D + generator step + D2H + uint8 conversion, comparing

- ``push``:   naive loop — each frame blocks on its own D2H before the
              next frame's H2D is issued, so transfers sit on the
              critical path;
- ``stream``: the depth-1 software pipeline (infer/stream.py::stream) —
              H2D(t) + dispatch(t) issued before the D2H sync of t-1,
              so transfers and host-side conversion ride under device
              compute (SURVEY.md §7 hard-part #5).

Because every iteration ends in a device_get, wall-clock here reflects
actual execution even through the dev harness's TPU relay (whose
block_until_ready does not await; device_get does).

    python scripts/bench_stream.py [preset] [n_frames]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.infer import StreamingGenerator
    from ir2rgb_tpu.train import create_model

    preset = sys.argv[1] if len(sys.argv) > 1 else "pix2pixhd_512"
    on_tpu = jax.default_backend() == "tpu"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else (64 if on_tpu else 4)

    cfg = PRESETS[preset]
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bf16" if on_tpu else "float32"))
    size = cfg.data.crop_size if on_tpu else 64
    model = create_model(cfg, steps_per_epoch=1000)
    g = model.g_init(jax.random.PRNGKey(0))
    if on_tpu:
        g = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
            else x, g)

    rng = np.random.RandomState(0)
    frames = [(rng.rand(size, size, cfg.model.input_nc) * 255)
              .astype(np.uint8) for _ in range(n)]

    def run(mode: str) -> float:
        stream = StreamingGenerator(model, g, (size, size))
        # warm (compile) outside the timed window
        stream.push(frames[0])
        stream.reset()
        t0 = time.perf_counter()
        if mode == "push":
            for f in frames:
                stream.push(f)
        else:
            for _ in stream.stream(iter(frames)):
                pass
        return time.perf_counter() - t0

    rows = []
    for mode in ("push", "stream"):
        best = min(run(mode) for _ in range(3))
        rows.append({"mode": mode, "preset": preset, "size": size,
                     "frames": n,
                     "ms_per_frame": round(best / n * 1e3, 3),
                     "fps_end_to_end": round(n / best, 2)})
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
