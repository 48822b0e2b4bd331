#!/usr/bin/env python
"""Training-throughput tracker (SURVEY.md §6: steps/sec, no fixed bar).

Measures the fused G+D train step on synthetic data via in-compiled-loop
slope timing (K steps inside one jitted lax.scan; see bench.py for why
host-side per-call timing is meaningless on this harness).

Not the driver-facing bench (that's /bench.py, one JSON line); this prints
one JSON line per preset for perf-regression tracking across rounds.

    python scripts/bench_train.py [preset ...]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(preset: str, batch: int = 0) -> dict:
    from bench import build  # the shared preset->bf16-model setup

    on_tpu = jax.default_backend() == "tpu"
    model, _ = build(preset, on_tpu)
    cfg = model.cfg
    size = cfg.data.crop_size if on_tpu else 64
    batch_size = batch or max(cfg.data.batch_size, 1)
    k1, k2 = (2, 8) if on_tpu else (1, 3)
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

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(state, batch, k):
        def body(s, _):
            s2, m = model.train_step(s, batch)
            return s2, m["G_GAN"]
        _, ms = jax.lax.scan(body, state, None, length=k)
        return jnp.sum(ms)

    float(loop(state, batch, k1))
    float(loop(state, batch, k2))

    def t(k, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(state, batch, k))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(k2) - t(k1)) / (k2 - k1)
    return {"preset": preset, "size": size, "batch": batch_size,
            "step_ms": round(per * 1e3, 2),
            "steps_per_sec": round(1 / per, 2),
            "frames_per_sec": round(batch_size / per, 2)}


if __name__ == "__main__":
    args = sys.argv[1:]
    batch = 0
    if "--batch" in args:
        i = args.index("--batch")
        batch = int(args[i + 1])
        del args[i:i + 2]
    presets = args or ["pix2pix_unet256", "pix2pixhd_512"]
    for p in presets:
        print(json.dumps(bench(p, batch)), flush=True)
