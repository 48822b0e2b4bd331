#!/usr/bin/env python
"""Serving-daemon throughput: N loopback clients through ir2rgb-serve.

End-to-end daemon numbers (socket framing + host codec + batching tick
loop + device step), complementing bench_multistream.py's pure-compute
ladder. Each client thread pipelines frames depth-1 over its own TCP
connection; aggregate fps = total frames / wall time across all
clients. On the dev harness the TPU relay's transfer cost dominates
(see bench_stream.py) — run on directly-attached hardware for
production numbers; on CPU this still isolates the daemon's host-side
overhead vs direct MultiStreamServer.step calls.

    python scripts/bench_serve.py [preset] [clients,clients,...] [--jpeg]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    from bench import build  # the shared preset->bf16-model setup

    from ir2rgb_tpu.infer.multistream import MultiStreamServer
    from ir2rgb_tpu.infer.server import FrameClient, FrameServer

    argv = [a for a in sys.argv[1:] if a != "--jpeg"]
    jpeg = "--jpeg" in sys.argv
    preset = argv[0] if argv else "temporal_512"
    on_tpu = jax.default_backend() == "tpu"
    ladders = ([int(s) for s in argv[1].split(",")]
               if len(argv) > 1 else ([1, 2, 8] if on_tpu else [1, 2]))
    frames_per_client = 48 if on_tpu else 8

    model, g = build(preset, on_tpu)
    size = model.cfg.data.crop_size if on_tpu else 64
    in_nc = model.cfg.model.input_nc

    rng = np.random.RandomState(0)
    for n_clients in ladders:
        srv = MultiStreamServer(model, g, (size, size),
                                n_slots=max(n_clients, 1))
        fs = FrameServer(srv, port=0, tick_ms=2.0,
                         encode="jpeg" if jpeg else "raw")
        fs.start()
        frames = [(rng.rand(size, size, in_nc) * 255).astype(np.uint8)
                  for _ in range(frames_per_client)]
        # warm-up: compile the batched step before the timed run
        with FrameClient("127.0.0.1", fs.port, jpeg=jpeg,
                         timeout=1200) as c:
            c.push(frames[0])
        # the close event is processed async by the tick loop — wait for
        # the slot to free before the timed clients connect
        # (fs.slots_active is the thread-safe read; srv.active_slots is
        # tick-loop-only)
        while fs.slots_active:
            time.sleep(0.01)
        # baseline the counters so the warm-up tick doesn't dilute the
        # frames_per_tick batching metric
        ticks0, frames0 = fs.ticks_served, fs.frames_served

        done = []
        lock = threading.Lock()

        def client():
            with FrameClient("127.0.0.1", fs.port, jpeg=jpeg,
                             timeout=1200) as c:
                n = sum(1 for _ in c.stream(frames))
            with lock:
                done.append(n)

        threads = [threading.Thread(target=client)
                   for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = sum(done)
        print(json.dumps({
            "preset": preset, "clients": n_clients, "size": size,
            "wire": "jpeg" if jpeg else "raw",
            "frames": total, "secs": round(dt, 3),
            "aggregate_fps": round(total / dt, 1),
            "ticks": fs.ticks_served - ticks0,
            "frames_per_tick": round(
                (fs.frames_served - frames0)
                / max(fs.ticks_served - ticks0, 1), 2),
        }), flush=True)
        fs.stop()


if __name__ == "__main__":
    main()
