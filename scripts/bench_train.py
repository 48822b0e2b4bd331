#!/usr/bin/env python
"""Training-throughput tracker (SURVEY.md §6: steps/sec, no fixed bar).

Measures the fused G+D train step on synthetic data for a chosen preset.
Not the driver-facing bench (that's /bench.py, one JSON line); this prints
a small table for perf-regression tracking across rounds.

    python scripts/bench_train.py [preset ...]
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(preset: str, steps: int = 30) -> dict:
    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS[preset]
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype="bf16"))
    size = cfg.data.crop_size if on_tpu else 64
    batch_size = max(cfg.data.batch_size, 1)
    model = create_model(cfg, steps_per_epoch=1000)
    rng = np.random.RandomState(0)
    batch_np = {
        "a": (rng.rand(batch_size, size, size, cfg.model.input_nc)
              .astype(np.float32) * 2 - 1),
        "b": (rng.rand(batch_size, size, size, cfg.model.output_nc)
              .astype(np.float32) * 2 - 1),
    }
    if cfg.model.model == "temporal":
        t = cfg.data.n_frames_total
        batch_np = {k: np.stack([v] * t, axis=1) for k, v in batch_np.items()}
    batch = jax.tree.map(jnp.asarray, batch_np)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(model.train_step, donate_argnums=(0,))
    state, m = step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / steps
    return {"preset": preset, "size": size, "batch": batch_size,
            "step_ms": round(dt * 1e3, 2),
            "steps_per_sec": round(1 / dt, 2),
            "frames_per_sec": round(batch_size / dt, 2)}


if __name__ == "__main__":
    presets = sys.argv[1:] or ["pix2pix_unet256", "pix2pixhd_512"]
    for p in presets:
        print(json.dumps(bench(p)), flush=True)
