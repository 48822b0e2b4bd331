#!/usr/bin/env python
"""Experiment: lowerings for the enhancer/trunk HEAD conv at high res.

The 1024p profile (round 3) shows the c7s1 head — reflect-pad + fused
image->s2d conv (8x8x3 window) + instance-norm stats — compiled into one
kOutput fusion running at ~5% MXU (1337 us for 12.9 GFLOPs at 1024p),
while the SAME conv+stats fusion shape at 1024 channels runs at ~78%
MFU. Hypotheses to test, in-compiled-loop slope timed:

A. current: conv_image_to_s2d(pad(x)) -> instance_norm_act_s2d
B. A + optimization_barrier between conv and stats (unfuse them)
C. fold image to s2d FIRST (cheap 3-ch reshape), reflect-pad in s2d,
   conv_on_s2d (4x4 window, 12-ch input) -> IN
D. B but barrier only after bias add (keep relu-apply fused)

Usage: python scripts/exp_head_conv.py [size] [ngf]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ir2rgb_tpu.nn import ops
from ir2rgb_tpu.nn.s2d_space import (
    conv_image_to_s2d,
    conv_on_s2d,
    instance_norm_act_s2d,
    reflect_pad_s2d,
    to_s2d,
)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ngf = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dtype = jnp.bfloat16

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, size, size, 3)).astype(dtype)
    w = (jax.random.normal(k, (7, 7, 3, ngf)) * 0.05).astype(dtype)
    b = jnp.zeros((ngf,), dtype)

    def head_a(x):
        xp = ops.reflect_pad(x, 3)
        y = conv_image_to_s2d(xp, w) + jnp.tile(b, 4)
        return instance_norm_act_s2d(y, "relu")

    def head_b(x):
        xp = ops.reflect_pad(x, 3)
        y = conv_image_to_s2d(xp, w) + jnp.tile(b, 4)
        (y,) = jax.lax.optimization_barrier((y,))
        return instance_norm_act_s2d(y, "relu")

    def head_c(x):
        xp = ops.reflect_pad(x, 3)           # (1, S+6, S+6, 3) — even dims
        xs = to_s2d(xp)                      # (1, (S+6)/2, (S+6)/2, 12)
        y = conv_on_s2d(xs, w, stride=1, pad=0) + jnp.tile(b, 4)
        return instance_norm_act_s2d(y, "relu")

    def head_d(x):
        xp = ops.reflect_pad(x, 3)
        y = conv_image_to_s2d(xp, w)
        (y,) = jax.lax.optimization_barrier((y,))
        y = y + jnp.tile(b, 4)
        return instance_norm_act_s2d(y, "relu")

    def head_e(x):
        """Explicit im2col + ONE K=(k//2+1)^2*4*ci matmul: the 3-channel
        image defeats XLA's tap-iterated conv (K=3 per MXU pass); fold
        to s2d, gather the 4x4 s2d window as 16 shifted slices
        concatenated on channels (one copy pass), then a single
        MXU-shaped dot emits the s2d rep."""
        import numpy as _np
        xp = ops.reflect_pad(x, 3)
        xs = to_s2d(xp)                       # (1, (S+6)/2, (S+6)/2, 12)
        n, hs, ws, c4 = xs.shape
        ci, co = w.shape[2], w.shape[3]
        kk2 = 7 // 2 + 1                      # 4 s2d offsets for k=7
        out = hs - kk2 + 1                    # = S/2
        patches = jnp.concatenate(
            [xs[:, sh:sh + out, sw:sw + out, :]
             for sh in range(kk2) for sw in range(kk2)], axis=-1)
        wk = _np.zeros((kk2, kk2, 2, 2, ci, 2, 2, co), _np.float32)
        wnp = _np.asarray(w, _np.float32)
        for dh in (0, 1):
            for dw in (0, 1):
                for sh in range(kk2):
                    for sw in range(kk2):
                        for qh in (0, 1):
                            for qw in (0, 1):
                                rh = 2 * sh + qh - dh
                                rw = 2 * sw + qw - dw
                                if 0 <= rh < 7 and 0 <= rw < 7:
                                    wk[sh, sw, qh, qw, :, dh, dw, :] = \
                                        wnp[rh, rw]
        wk2 = jnp.asarray(
            wk.reshape(kk2 * kk2 * 4 * ci, 4 * co), x.dtype)
        from jax import lax
        y = lax.dot_general(patches, wk2, (((3,), (0,)), ((), ())),
                            precision=lax.Precision.DEFAULT)
        y = y.astype(x.dtype) + jnp.tile(b, 4)
        return instance_norm_act_s2d(y, "relu")

    def head_f(x):
        """fold-4 conv: kk^2=9 taps of K=48 + pre-d2s IN (round 3)."""
        from ir2rgb_tpu.nn.s2d_space import head_fold4_in_act_s2d
        from jax import lax
        xp = ops.reflect_pad(x, 3)
        return head_fold4_in_act_s2d(xp, w, b, "relu",
                                     precision=lax.Precision.DEFAULT)

    variants = {"A_current": head_a, "B_barrier": head_b,
                "C_s2d_first": head_c, "D_barrier_prebias": head_d,
                "E_im2col": head_e, "F_fold4": head_f}
    only = os.environ.get("IR2RGB_EXP_ONLY")
    if only:
        keep = {"A_current": head_a}
        keep.update({k: v for k, v in variants.items()
                     if k.split("_")[0] in only.split(",")})
        variants = keep

    # correctness first (vs A)
    ref = np.asarray(head_a(x), np.float32)
    for name, fn in variants.items():
        got = np.asarray(fn(x), np.float32)
        err = float(np.abs(got - ref).max())
        print(f"{name}: max|diff vs A| = {err:.5f}", flush=True)

    for name, fn in variants.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x0, n, fn=fn):
            def body(c, _):
                y = fn(x0 + c.astype(x0.dtype))
                return jnp.sum(y.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32) * 0, None,
                                length=n)
            return c

        float(loop(x, 4))
        float(loop(x, 24))

        def timed(n, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(loop(x, n))
                best = min(best, time.perf_counter() - t0)
            return best

        us = (timed(24) - timed(4)) / 20 * 1e6
        print(f"{name}: {us:8.1f} us/iter @ {size}px ngf={ngf}", flush=True)


if __name__ == "__main__":
    main()
