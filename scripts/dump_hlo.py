#!/usr/bin/env python
"""Dump the compiled (post-optimization) HLO of a preset's generator —
with per-op metadata (source op_name paths) — so profile hot-ops can be
mapped back to framework source ops.

Usage: python scripts/dump_hlo.py [preset] [out.txt]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "pix2pixhd_2048"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/hlo_{preset}.txt"

    from bench import build  # the shared preset->bf16-model setup

    on_tpu = jax.default_backend() == "tpu"
    model, g = build(preset, on_tpu)
    size = model.cfg.data.crop_size
    x = jnp.zeros((1, size, size, 3),
                  jnp.bfloat16 if on_tpu else jnp.float32)
    fwd = jax.jit(lambda p, a: model.generate(p, a, train=False))
    compiled = fwd.lower(g, x).compile()
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()] \
        if hasattr(compiled, "runtime_executable") else [compiled.as_text()]
    with open(out, "w") as fh:
        for t in texts:
            fh.write(t)
    print(f"wrote {out} ({sum(len(t) for t in texts)} bytes)")


if __name__ == "__main__":
    main()
