"""Headline benchmark: 512x512 generator frames/sec/chip, batch-1 streaming
(BASELINE.json:2,5 — target >= 200 fps on TPU v5e; vs_baseline = fps/200).

Model: the pix2pixHD-tier coarse-to-fine generator (preset pix2pixhd_512,
family 512p width ngf=32) in the production serving configuration: bf16
compute, subpixel transposed-conv lowering, fp32 norm statistics.

Methodology — in-compiled-loop slope timing: K generator steps run inside
ONE jitted lax.scan with the output fed back as the next input (so no step
can be elided or deduplicated), and a scalar checksum is fetched to force
execution. Per-frame time = (t(K2) - t(K1)) / (K2 - K1), which cancels
dispatch/transfer constants. This mirrors production streaming, where the
frame carry stays in HBM and H2D of the next frame overlaps compute
(host-side per-call timing through the dev harness's TPU relay measures
only dispatch latency — its block_until_ready does not await execution).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.train import create_model

    on_tpu = jax.default_backend() == "tpu"
    cfg = PRESETS["pix2pixhd_512"]
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bf16" if on_tpu else "float32"))
    model = create_model(cfg, steps_per_epoch=1000)
    g = model.g_init(jax.random.PRNGKey(0))
    if on_tpu:
        g = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
            else x, g)

    size = 512 if on_tpu else 128
    k1, k2 = (8, 40) if on_tpu else (2, 6)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(params, x0, k):
        def body(x, _):
            return model.generate(params, x, train=False), ()
        xk, _ = jax.lax.scan(body, x0, None, length=k)
        return jnp.sum(xk.astype(jnp.float32))

    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (1, size, size, 3)).astype(dtype)
    float(loop(g, x0, k1))  # compile both variants
    float(loop(g, x0, k2))

    def timed(k, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(g, x0, k))
            best = min(best, time.perf_counter() - t0)
        return best

    per_frame = (timed(k2) - timed(k1)) / (k2 - k1)
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": f"{size}x{size}_generator_fps_per_chip_batch1",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
