"""Inference — single-frame apply and batch-1 temporal streaming.

Rebuild of the reference's ``test.py`` hot loop (SURVEY.md §3.2): the
headline metric is 512x512 generator frames/sec/chip at batch 1, streaming
(BASELINE.json:2,5). The sequential prev-frame dependency of temporal mode
forbids batching across time, so the design keeps everything on device:

- the generator step is compiled once with donated input/carry buffers;
- the previous-frame carry never leaves HBM (SURVEY.md §7 hard-part #5 —
  a per-frame host sync would cap throughput);
- H2D of frame t+1 overlaps compute of frame t via ``jax.device_put`` of
  the next frame before blocking on the current output (double buffering
  at the dispatch level: JAX's async dispatch queues the transfer while
  the TPU is busy);
- a ``lax.scan`` path (``translate_clip``) compiles whole clips into one
  XLA program for offline (non-streaming) batch translation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ir2rgb_tpu.train.model import GanModel


def single_frame_infer(model: GanModel, g_params, donate: bool = True):
    """Compiled no-grad G forward: a_frame (B,H,W,C) -> fake (B,H,W,3)."""

    def fn(params, a):
        return model.generate(params, a, train=False)

    return jax.jit(fn, donate_argnums=(1,) if donate else ())


class StreamingGenerator:
    """Stateful batch-1 streaming translator for temporal mode.

    Usage:
        stream = StreamingGenerator(model, g_params)
        for ir_frame in frames:          # uint8/float host frames
            rgb = stream.push(ir_frame)  # numpy uint8 out

    The on-device carry holds the last n_frames_g-1 generated frames;
    ``push_device`` skips host conversion entirely for benchmarking.
    """

    def __init__(self, model: GanModel, g_params, frame_hw: Tuple[int, int],
                 batch: int = 1, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'spatial'
        axis (see ``parallel.dp_sp_mesh``) — frames, carry, and output
        shard image rows across the mesh so one frame serves on several
        chips (>1024p frames past one chip's HBM/latency budget). Params
        are replicated; XLA inserts conv halo exchanges over ICI."""
        self.model = model
        cfgm = model.cfg.model
        self.temporal = cfgm.model == "temporal"
        n_prev = (cfgm.n_frames_g - 1) if self.temporal else 0
        self.carry_c = cfgm.output_nc * n_prev
        self.out_nc = cfgm.output_nc
        h, w = frame_hw
        self._carry = (jnp.zeros((batch, h, w, self.carry_c), jnp.float32)
                       if self.temporal else None)

        self._frame_sharding = None
        if mesh is not None:
            from ir2rgb_tpu.parallel import batch_sharding, replicate
            rep, shard = replicate(mesh), batch_sharding(mesh)
            g_params = jax.device_put(g_params, rep)
            if self._carry is not None:
                self._carry = jax.device_put(self._carry, shard)
            self._frame_sharding = shard
        self.g_params = g_params

        if self.temporal:
            def step(params, a, carry):
                fake = model.generate(params, a, prev=carry, train=False)
                fake32 = fake.astype(jnp.float32)
                new_carry = jnp.concatenate(
                    [fake32, carry], axis=-1)[..., :self.carry_c]
                return fake, new_carry

            # donate a + carry: their HBM is recycled for the outputs
            self._step = jax.jit(step, donate_argnums=(1, 2))
        else:
            def step(params, a):
                return model.generate(params, a, train=False)

            self._step = jax.jit(step, donate_argnums=(1,))

    def reset(self) -> None:
        if self._carry is not None:
            self._carry = jnp.zeros_like(self._carry)

    def push_device(self, a: jax.Array) -> jax.Array:
        """Device-in device-out step (no host sync — benchmark path)."""
        if self._frame_sharding is not None:
            a = jax.device_put(a, self._frame_sharding)
        if self.temporal:
            fake, self._carry = self._step(self.g_params, a, self._carry)
            return fake
        return self._step(self.g_params, a)

    def push(self, a_host: np.ndarray) -> np.ndarray:
        """Host frame in ([-1,1] float or uint8), uint8 RGB out."""
        a = np.asarray(a_host)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / 127.5 - 1.0
        if a.ndim == 3:
            a = a[None]
        fake = self.push_device(jnp.asarray(a))
        return tensor2im(fake)


def translate_clip(model: GanModel, g_params, a_seq: jax.Array) -> jax.Array:
    """Whole-clip translation as one scan-compiled XLA program.

    a_seq: (T, B, H, W, C) in [-1,1]. Returns (T, B, H, W, 3).
    O(1) memory in clip length for the carry; frames stream out of HBM.
    """
    cfgm = model.cfg.model
    if cfgm.model != "temporal":
        return jax.lax.map(lambda a: model.generate(g_params, a,
                                                    train=False), a_seq)
    n_prev = cfgm.n_frames_g - 1
    out_nc = cfgm.output_nc
    carry0 = jnp.zeros(a_seq.shape[1:4] + (out_nc * n_prev,), jnp.float32)

    def step(carry, a_t):
        fake = model.generate(g_params, a_t, prev=carry, train=False)
        fake32 = fake.astype(jnp.float32)
        new_carry = jnp.concatenate([fake32, carry],
                                    axis=-1)[..., :out_nc * n_prev]
        return new_carry, fake

    _, fakes = jax.lax.scan(step, carry0, a_seq)
    return fakes


def tensor2im(t: jax.Array) -> np.ndarray:
    """[-1,1] NHWC device tensor -> uint8 HWC (reference util.tensor2im);
    the single device->host boundary of the serve path."""
    arr = np.asarray(jax.device_get(t))
    if arr.ndim == 4:
        arr = arr[0]
    arr = (np.clip(arr.astype(np.float32), -1, 1) + 1.0) * 127.5
    return arr.astype(np.uint8)
