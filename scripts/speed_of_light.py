#!/usr/bin/env python
"""Speed-of-light accounting for the benched generator configs.

MFU alone misreads channel-starved conv GANs: at batch 1 most layers of
the 512p local config move far more HBM bytes per FLOP than the MXU's
balance point, so their character is bandwidth-, not arithmetic-bound.
From XLA's cost analysis of the compiled forward this reports:

    t_flops = flops / 197 TF/s   — a TRUE floor (arithmetic cannot be
              skipped); measured/t_flops is the honest "distance to
              speed of light" for each config.
    t_bytes = per-op bytes accessed / 819 GB/s — NOT a floor: the
              per-HLO byte count ignores fusion, so it is a PRE-FUSION
              traffic estimate. Measured times BELOW it (all four
              configs here) quantify how much traffic XLA's fusion +
              this repo's lowerings eliminated.

Measured on the v5e (BENCH_DETAIL.json): the local 512p config runs at
2.7x its arithmetic floor but 37%% FASTER than its naive-traffic time —
the remaining gap to t_flops is intrinsic to 12-to-128-channel convs at
batch 1, and the batched row (b8, 2.5 ms/frame) shows exactly that gap
closing when the MXU is fed.

    python scripts/speed_of_light.py [preset ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197.0   # v5e bf16
PEAK_GBPS = 819.0     # v5e HBM


def sol(preset: str, measured_ms: float) -> dict:
    import bench as bench_mod

    model, g = bench_mod.build(preset, True)
    size = model.cfg.data.crop_size
    x0 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    if model.cfg.model.model == "temporal":
        n_prev = model.cfg.model.n_frames_g - 1
        prev = jnp.zeros((1, size, size,
                          model.cfg.model.output_nc * n_prev), jnp.bfloat16)
        fwd = jax.jit(lambda p, a: model.generate(p, a, prev=prev,
                                                  train=False))
    else:
        fwd = jax.jit(lambda p, a: model.generate(p, a, train=False))
    cost = fwd.lower(g, x0).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    t_flops = flops / (PEAK_TFLOPS * 1e12) * 1e3
    t_bytes = byts / (PEAK_GBPS * 1e9) * 1e3
    out = {
        "preset": preset,
        "gflops": round(flops / 1e9, 1),
        "prefusion_hbm_gb": round(byts / 1e9, 3),
        "t_flops_floor_ms": round(t_flops, 3),
        "t_prefusion_bytes_ms": round(t_bytes, 3),
        "character": "bandwidth" if t_bytes > t_flops else "arithmetic",
        "measured_ms": measured_ms,
    }
    if measured_ms:
        out["x_arithmetic_floor"] = round(measured_ms / t_flops, 2)
        out["traffic_eliminated_vs_prefusion"] = round(
            1.0 - measured_ms / t_bytes, 3)
    return out


if __name__ == "__main__":
    # measured ms/frame from the committed BENCH_DETAIL.json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    detail = json.load(open(os.path.join(repo, "BENCH_DETAIL.json")))
    measured = {r["preset"]: r["ms_per_frame"] for r in detail["configs"]}
    presets = sys.argv[1:] or ["pix2pixhd_512", "pix2pixhd_global_512"]
    for p in presets:
        print(json.dumps(sol(p, measured.get(p))), flush=True)
