"""Headline benchmark: 512x512 generator frames/sec/chip, batch-1 streaming
(BASELINE.json:2,5 — target >= 200 fps on TPU v5e; vs_baseline = fps/200).

Runs the pix2pixHD-tier coarse-to-fine generator in the production serving
configuration: bf16 compute, Pallas fused instance-norm+act kernels,
donated device-resident buffers, no per-frame host sync (one final
block_until_ready over the whole timed window).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from ir2rgb_tpu.config import PRESETS
    import dataclasses
    from ir2rgb_tpu.train import create_model
    from ir2rgb_tpu.infer import StreamingGenerator

    cfg = PRESETS["pix2pixhd_512"]
    on_tpu = jax.default_backend() == "tpu"
    compute = "bf16" if on_tpu else "float32"
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                compute_dtype=compute))
    model = create_model(cfg, steps_per_epoch=1000)
    g_params = model.g_init(jax.random.PRNGKey(0))
    if on_tpu:
        g_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
            else x, g_params)

    size = 512 if on_tpu else 128  # CPU smoke keeps runtime sane
    stream = StreamingGenerator(model, g_params, (size, size))

    import numpy as np
    frame_host = np.random.RandomState(1).uniform(
        -1, 1, (1, size, size, 3)).astype(np.float32)

    # warmup / compile (push_device donates its input — fresh put per call)
    out = stream.push_device(jax.device_put(frame_host))
    jax.block_until_ready(out)

    n = 200 if on_tpu else 10
    outs = []
    t0 = time.perf_counter()
    for _ in range(n):
        # H2D of the next frame queues behind compute (async dispatch);
        # the metric is streaming generator throughput incl. transfer
        out = stream.push_device(jax.device_put(frame_host))
        outs.append(out)
    jax.block_until_ready(outs[-1])
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": f"{size}x{size}_generator_fps_per_chip_batch1",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
