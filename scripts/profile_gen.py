"""Profile the headline 512x512 generator on the TPU and print a
per-op-category device-time breakdown (docs/DESIGN.md §4/§7: profiles
drove every lowering; this script regenerates the breakdown table).

Usage: python scripts/profile_gen.py [preset] [--trace-dir DIR]
Writes the parsed summary as JSON to stdout and the raw trace under
--trace-dir (default /tmp/i2r_prof).
"""

from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_trace(preset: str, trace_dir: str, size: int = 0,
              k: int = 12, train: bool = False,
              batch: int = 1) -> None:
    from bench import build  # the shared preset->bf16-model setup

    on_tpu = jax.default_backend() == "tpu"
    model, g = build(preset, on_tpu, init_g=not train)
    if not size:  # default: the preset's own frame size (1024/2048 tiers)
        size = model.cfg.data.crop_size
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if train:
        import numpy as np
        rng = np.random.RandomState(0)
        batch = {
            "a": jnp.asarray(rng.rand(batch, size, size, 3) * 2 - 1,
                             jnp.float32),
            "b": jnp.asarray(rng.rand(batch, size, size, 3) * 2 - 1,
                             jnp.float32),
        }
        state = model.init_state(jax.random.PRNGKey(0), batch)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(state, batch, n):
            def body(s, _):
                s2, m = model.train_step(s, batch)
                return s2, m["G_GAN"]
            _, ms = jax.lax.scan(body, state, None, length=n)
            return jnp.sum(ms)

        float(loop(state, batch, k))  # compile
        jax.profiler.start_trace(trace_dir)
        float(loop(state, batch, k))
        jax.profiler.stop_trace()
        return

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, x0, n):
        def body(x, _):
            return model.generate(params, x, train=False), ()
        xk, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(xk.astype(jnp.float32))

    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (batch, size, size, 3)).astype(dtype)
    float(loop(g, x0, k))  # compile
    jax.profiler.start_trace(trace_dir)
    float(loop(g, x0, k))
    jax.profiler.stop_trace()


_CONTAINERS = ("jit_", "while", "body", "condition", "fused_computation")


def parse_trace(trace_dir: str, k: int, top_n: int = 30) -> None:
    """Sum leaf op durations on the device's 'XLA Ops' track, attributed
    by the trace's own hlo_category (TPU wraps convs in fusion.* names,
    so name-based categorization is useless)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(json.dumps({"error": f"no trace under {trace_dir}"}))
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_tracks = {key for key, n in tid_name.items()
                 if n == "XLA Ops" and ("TPU" in pid_name.get(key[0], "")
                                        or "device" in
                                        pid_name.get(key[0], "").lower())}
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    long_names = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        name = e.get("name", "")
        if name.startswith(_CONTAINERS):
            continue  # parents of nested ops: would double-count
        args = e.get("args", {})
        cat = args.get("hlo_category", "uncategorized")
        dur_us = float(e["dur"])
        per_op[name] += dur_us
        per_cat[cat] += dur_us
        total += dur_us
        if name not in long_names:
            long_names[name] = args.get("long_name", "")[:140]
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
    print(json.dumps({
        "trace": path,
        "k_frames": k,
        "leaf_device_ms_total": round(total / 1000, 3),
        "per_frame_ms": round(total / 1000 / k, 3),
        "categories_ms_per_frame": {
            c: round(v / 1000 / k, 3)
            for c, v in sorted(per_cat.items(), key=lambda kv: -kv[1])},
        "top_ops_us_per_frame": [
            {"op": n, "us": round(v / k, 1), "hlo": long_names[n]}
            for n, v in top],
    }, indent=1))


if __name__ == "__main__":
    preset = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("-") else "pix2pixhd_512"
    trace_dir = "/tmp/i2r_prof"
    if "--trace-dir" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace-dir") + 1]
    train = "--train" in sys.argv
    size = 0
    if "--size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--size") + 1])
    k = 6 if train else 12
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    batch = 1
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    run_trace(preset, trace_dir, size=size, k=k, train=train, batch=batch)
    parse_trace(trace_dir, k)
