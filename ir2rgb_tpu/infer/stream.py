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

from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ir2rgb_tpu.train.model import GanModel


def _dev_normalize(a_u8: jax.Array) -> jax.Array:
    """uint8 frame -> [-1,1] float32 ON DEVICE. Bit-identical to the
    host-side ``a.astype(np.float32) / 127.5 - 1.0`` (uint8->f32 is
    exact; same IEEE ops) but moves the 4x-smaller uint8 buffer over
    the wire instead of the f32 one."""
    return a_u8.astype(jnp.float32) / 127.5 - 1.0


def _dev_quantize(fake: jax.Array) -> jax.Array:
    """[-1,1] frame -> uint8 ON DEVICE; mirrors tensor2im's
    clip/scale/truncate exactly so the D2H moves 1 byte/px."""
    arr = (jnp.clip(fake.astype(jnp.float32), -1, 1) + 1.0) * 127.5
    return arr.astype(jnp.uint8)


def host_to_wire_u8(a: np.ndarray, label: bool) -> np.ndarray:
    """Host-side conversion of a non-uint8 frame to the uint8 wire —
    THE single definition shared by every serving surface
    (StreamingGenerator, MultiStreamServer, ExportedStream), so the
    live, multi-stream, and exported paths cannot drift:

    - image frames: [-1, 1] floats quantize like tensor2im;
    - label frames (label_nc > 0): class ids round/clip to the id byte
      (image quantization would collapse id 0 -> 127, ids >= 1 -> 255).
    """
    if label:
        return np.clip(np.round(a.astype(np.float32)), 0,
                       255).astype(np.uint8)
    return ((np.clip(a.astype(np.float32), -1, 1) + 1.0)
            * 127.5).astype(np.uint8)


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

        # label_nc models stream raw integer class-id frames: the uint8
        # wire path must NOT [-1,1]-normalize them (generate() one-hot
        # encodes the ids on device). Their int id buffers also can't be
        # recycled into the float/uint8 outputs, so donating the frame
        # argument would only emit XLA "donated buffer not usable"
        # warnings every step — donate the carry only.
        label = cfgm.label_nc > 0
        norm = ((lambda x: x.astype(jnp.float32))
                if label else _dev_normalize)
        frame_donate = () if label else (1,)

        if self.temporal:
            def step(params, a, carry):
                fake = model.generate(params, a, prev=carry, train=False)
                fake32 = fake.astype(jnp.float32)
                new_carry = jnp.concatenate(
                    [fake32, carry], axis=-1)[..., :self.carry_c]
                return fake, new_carry

            # donate a + carry: their HBM is recycled for the outputs
            self._step = jax.jit(step, donate_argnums=frame_donate + (2,))

            def step_u8(params, a_u8, carry):
                fake, new_carry = step(params, norm(a_u8), carry)
                return _dev_quantize(fake), new_carry

            self._step_u8 = jax.jit(step_u8,
                                     donate_argnums=frame_donate + (2,))
        else:
            def step(params, a):
                return model.generate(params, a, train=False)

            self._step = jax.jit(step, donate_argnums=frame_donate)

            # pix2pixHD test-time conditioning (style feat map and/or
            # instance edge channel): a separate jitted step so the
            # common unconditioned path keeps its trace; None arguments
            # are empty pytree leaves, so feat-only / edges-only /
            # both each get their own cached trace
            def step_extra(params, a, feat, edges):
                return model.generate(params, a, train=False, feat=feat,
                                      edges=edges)

            self._step_extra = jax.jit(step_extra,
                                        donate_argnums=frame_donate)

            def step_u8(params, a_u8):
                return _dev_quantize(step(params, norm(a_u8)))

            self._step_u8 = jax.jit(step_u8, donate_argnums=frame_donate)

    def reset(self) -> None:
        if self._carry is not None:
            self._carry = jnp.zeros_like(self._carry)

    def push_device(self, a: jax.Array,
                    feat: Optional[jax.Array] = None,
                    edges: Optional[jax.Array] = None) -> jax.Array:
        """Device-in device-out step (no host sync — benchmark path).

        DONATES ``a``: the input frame's HBM is recycled for the output
        (for non-label models), so the caller's device array is DELETED
        after the call — snapshot anything you still need first, and
        never push the same device array twice (the second call raises
        'Array has been deleted'). Use :meth:`push`/:meth:`stream` for
        host-side frames, which copy by construction.

        ``feat``: optional netE style map (B, H, W, feat_num) — the
        pix2pixHD --use_encoded_image / --cluster_path test paths.
        ``edges``: optional (B, H, W, 1) instance boundary channel
        (use_instance_edges models)."""
        if self._frame_sharding is not None:
            a = jax.device_put(a, self._frame_sharding)
        if feat is not None or edges is not None:
            if self.temporal:
                raise ValueError(
                    "feature/edge maps are a pix2pixHD (single-frame) "
                    "test surface; temporal streaming has no such input")
            return self._step_extra(self.g_params, a, feat, edges)
        if self.temporal:
            fake, self._carry = self._step(self.g_params, a, self._carry)
            return fake
        return self._step(self.g_params, a)

    def _dispatch(self, a_host: np.ndarray) -> Tuple[jax.Array, bool]:
        """H2D + compute dispatch for one host frame; returns the
        on-device output and whether it is already uint8.

        uint8 frames take the wire-thin path: the raw bytes go over
        H2D (4x smaller than f32) and normalization/quantization run
        on device, so the D2H result is uint8 too (another 4x)."""
        a = np.asarray(a_host)
        if a.ndim == 3:
            a = a[None]
        if a.dtype == np.uint8:
            # one sharded H2D straight from host memory — asarray-then-
            # reshard would transfer twice (default device, then mesh)
            a_dev = (jnp.asarray(a) if self._frame_sharding is None
                     else jax.device_put(a, self._frame_sharding))
            if self.temporal:
                out, self._carry = self._step_u8(self.g_params, a_dev,
                                                 self._carry)
            else:
                out = self._step_u8(self.g_params, a_dev)
            return out, True
        return self.push_device(jnp.asarray(a.astype(np.float32))), False

    @staticmethod
    def _fetch(out: jax.Array, is_u8: bool) -> np.ndarray:
        if is_u8:
            arr = np.asarray(jax.device_get(out))
            # squeeze only the singleton batch dim — a pushed stack of
            # B frames must come back as all B, not silently frame 0
            return arr[0] if arr.ndim == 4 and arr.shape[0] == 1 else arr
        return tensor2im(out)

    def push(self, a_host: np.ndarray) -> np.ndarray:
        """Host frame in (uint8, or [-1,1] float), uint8 RGB out.

        NB: this blocks on the D2H fetch of THIS frame's output before
        the caller can supply the next frame, so host prep + H2D sit on
        the critical path. For a continuous feed use :meth:`stream`,
        which pipelines them under device compute."""
        return self._fetch(*self._dispatch(a_host))

    def stream(self, frames: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Pipelined serving loop: host frames in, uint8 RGB out, one
        frame of latency.

        Depth-1 software pipeline (SURVEY.md §7 hard-part #5): for each
        incoming frame the host prep + ``device_put`` H2D and the
        dispatch of compute(t) all happen BEFORE blocking on the D2H of
        output t-1 — JAX's async dispatch queues the transfer and the
        step while the TPU is still busy, so H2D(t+1) and the host-side
        handling of output(t-1) overlap compute(t). Same outputs as
        sequential :meth:`push` calls (tested)."""
        pending = None
        for a_host in frames:
            out = self._dispatch(a_host)            # async H2D + dispatch
            if pending is not None:
                yield self._fetch(*pending)         # sync on t-1 only
            pending = out
        if pending is not None:
            yield self._fetch(*pending)


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


def label2im(t, label_nc: int) -> np.ndarray:
    """Integer class-id map -> palette RGB uint8 for galleries (the
    reference ``util.tensor2label``/``Colorize`` analog). Colors follow
    the standard VOC bit-interleave colormap the reference's Colorize
    uses, so id k gets the same color here as there."""
    arr = np.asarray(jax.device_get(t))
    if arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    n = max(int(label_nc), 1)
    ids = np.clip(np.round(arr).astype(np.int64), 0, n - 1)
    palette = np.zeros((n, 3), np.uint8)
    for k in range(n):
        r = g = b = 0
        c = k
        for j in range(7):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        palette[k] = (r, g, b)
    return palette[ids]


def tensor2im(t: jax.Array) -> np.ndarray:
    """[-1,1] NHWC device tensor -> uint8 HWC (reference util.tensor2im);
    the single device->host boundary of the serve path. A batch of B>1
    frames stays NHWC uint8 (batch-1 squeezes to HWC as the reference)."""
    arr = np.asarray(jax.device_get(t))
    if arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    arr = (np.clip(arr.astype(np.float32), -1, 1) + 1.0) * 127.5
    return arr.astype(np.uint8)
