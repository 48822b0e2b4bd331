#!/usr/bin/env python
"""Multi-stream serving ladder: aggregate frames/sec/chip vs slot count.

One MultiStreamServer tick runs the generator once on a (S, H, W, C)
batch — S independent video streams advance together (each with its own
carry). Batch-1 streaming leaves the MXU under-fed (DESIGN.md: batch-8
runs the same 512p model at ~2.1x the per-frame throughput), so serving
many streams per chip is the capacity story; this script measures where
the knee is.

Methodology — in-compiled-loop slope timing, exactly as bench.py: K
ticks of the server's tick math (uint8 normalize -> G forward with
per-slot carry -> uint8 quantize, mask selects included) run inside one
jitted lax.scan with the carry chaining tick-to-tick (the production
dependency — no tick can be elided), per-tick time = slope between K1
and K2. Host-loop dispatch through the dev harness's TPU relay is NOT a
compute measurement (see bench_stream.py for the wire story).

    python scripts/bench_multistream.py [preset] [slot,slot,...]
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

from ir2rgb_tpu.infer.stream import _dev_normalize, _dev_quantize


def main() -> None:
    from bench import build  # the shared preset->bf16-model setup

    args = sys.argv[1:]
    quant = None
    if "--quant" in args:
        quant = args[args.index("--quant") + 1]
        del args[args.index("--quant"):args.index("--quant") + 2]
    preset = args[0] if args else "temporal_512"
    on_tpu = jax.default_backend() == "tpu"
    slots = ([int(s) for s in args[1].split(",")]
             if len(args) > 1 else ([1, 2, 4, 8] if on_tpu else [1, 2]))

    model, g = build(preset, on_tpu, quant_mode=quant)
    size = model.cfg.data.crop_size if on_tpu else 64

    cfgm = model.cfg.model
    temporal = cfgm.model == "temporal"
    carry_c = cfgm.output_nc * (cfgm.n_frames_g - 1) if temporal else 0

    rng = np.random.RandomState(0)
    for s_count in slots:
        x0 = jnp.asarray((rng.rand(s_count, size, size, cfgm.input_nc)
                          * 255).astype(np.uint8))
        valid = jnp.ones(s_count, bool)
        reset = jnp.zeros(s_count, bool)

        if temporal:
            carry0 = jnp.zeros((s_count, size, size, carry_c),
                               jnp.float32)

            @functools.partial(jax.jit, static_argnames=("k",))
            def loop(params, frames, carry0, k):
                def body(carry, _):
                    # the MultiStreamServer tick, masks included
                    x = _dev_normalize(frames)
                    keep = ~reset[:, None, None, None]
                    carry_in = jnp.where(keep, carry, 0.0)
                    fake = model.generate(params, x, prev=carry_in,
                                          train=False)
                    adv = jnp.concatenate(
                        [fake.astype(jnp.float32), carry_in],
                        axis=-1)[..., :carry_c]
                    new_carry = jnp.where(valid[:, None, None, None],
                                          adv, carry_in)
                    return new_carry, ()
                ck, _ = jax.lax.scan(body, carry0, None, length=k)
                return jnp.sum(ck)

            run = lambda k: float(loop(g, x0, carry0, k))
        else:
            @functools.partial(jax.jit, static_argnames=("k",))
            def loop(params, frames0, k):
                def body(frames, _):
                    # uint8 out chains to the next tick's uint8 in
                    x = _dev_normalize(frames)
                    out = _dev_quantize(model.generate(params, x,
                                                       train=False))
                    return out, ()
                fk, _ = jax.lax.scan(body, frames0, None, length=k)
                return jnp.sum(fk.astype(jnp.float32))

            run = lambda k: float(loop(g, x0, k))

        k1, k2 = ((4, 16) if size >= 1024 or s_count > 2 else (8, 40)) \
            if on_tpu else (1, 3)
        run(k1), run(k2)  # compile both

        def timed(k, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                run(k)
                best = min(best, time.perf_counter() - t0)
            return best

        per_tick = (timed(k2) - timed(k1)) / (k2 - k1)
        print(json.dumps({
            "preset": preset + (f"_{quant}" if quant else ""),
            "size": size, "slots": s_count,
            "ms_per_tick": round(per_tick * 1e3, 3),
            "fps_per_stream": round(1.0 / per_tick, 2),
            "fps_aggregate": round(s_count / per_tick, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
