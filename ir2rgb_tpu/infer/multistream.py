"""Multi-stream batched video serving.

The reference's serving story is strictly one stream at a time
(``test.py`` walks one frame folder serially — SURVEY.md §3.2). On TPU
the batch-1 generator leaves most of the MXU idle: the measured 512p
frame runs 2.1x more frames/sec/chip at batch 8 than 8 separate batch-1
loops would (DESIGN.md bench table: 283 fps b1 vs ~417 fps/chip b8).
This module turns that into a serving capability the reference never
had: N **independent** video streams share ONE compiled batched step,
each with its own previous-frame carry living in HBM.

Design (TPU-first):

- The step is compiled ONCE for a fixed slot count S; streams attach to
  and detach from slots at tick boundaries without retracing. All
  per-slot state transitions (fresh-stream carry reset, missed-tick
  carry hold) are mask selects INSIDE the jitted step — host code only
  builds the (S,) masks.
- Carry semantics per slot and tick:
    reset[i]          -> carry zeroed before compute (stream start)
    valid[i]          -> carry advances with the new generated frame
    not valid[i]      -> carry held (stream skipped this tick; it
                         resumes later without losing temporal context)
- Frames cross H2D as uint8 (4x thinner than f32) and outputs come back
  uint8; normalize/quantize run on device (see ``stream._dev_normalize``).
- ``ticks()`` software-pipelines host IO under device compute exactly
  like ``StreamingGenerator.stream`` (depth-1: fetch of tick t-1 happens
  after dispatch of tick t).

Slot-count choice (scripts/bench_multistream.py measures the ladder,
slope method, one v5e chip): batch 8 is the throughput knee at both
512p (18.65 ms/tick, 429 aggregate fps vs 296 at batch 1; 479 under
int8_mixed) and 1024p (84 ms/tick, 95 vs 81). Batches 3-7 sit in a measured
XLA cliff: the compiler rewrites the convolutions into a
spatially-split form whose layouts conflict with the fp32 instance-norm
elementwise math, materializing ~0.4 ms layout copies per conv (batch-4
at 512p costs 25.4 ms/tick — MORE than batch 8; 6 costs 42 ms). The
server therefore pads its physical batch to the nearest good size
{1, 2, 8} on TPU by default — masked pad slots cost less than the
cliff — and CAPS it at the knee (round 5): past 8 slots a bigger
compiled batch loses absolute aggregate (512p: 383-403 fps at 16,
391-400 at 24, vs 429-479 at 8) while multiplying latency, so >8
attached streams are served by chained knee-sized chunk ticks over a
carry pool (gather by slot index, scatter the advanced carry back; a
scratch pool row absorbs pad-row writes). IR2RGB_IN_ELT=input
additionally trims the cliff itself (~14% at batch 4) by keeping the
normalize multiply in bf16 (stats stay fp32); see
nn/s2d_space.instance_norm_act_s2d.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ir2rgb_tpu.infer.stream import _dev_normalize, _dev_quantize
from ir2rgb_tpu.train.model import GanModel


# the measured aggregate-throughput knee of the batched tick (round-5
# ladder, one v5e chip, temporal configs): 8 slots peak BOTH tiers
# (512p 429 bf16 / 479 int8_mixed aggregate fps; 1024p 95), and larger
# compiled batches LOSE absolute aggregate (512p: 16 slots 383-403,
# 24 slots 391-400) while multiplying per-stream latency — two chained
# 8-ticks serve 16 streams faster than one 16-tick (37.3 vs 41.8 ms).
KNEE_SLOTS = 8


def _good_physical_slots(n: int) -> int:
    """Measured-good compiled batch size for n requested slots (see
    module docstring): 1 and 2 are fine natively; 3..8 pad to 8 (the
    mid-batch XLA cliff); beyond 8 the physical batch is CAPPED at the
    knee — more slots are served by chunked round-robin over a carry
    pool, which beats a bigger compiled batch in both aggregate fps and
    latency on the measured ladder."""
    if n <= 2:
        return n
    return min(((n + 7) // 8) * 8, KNEE_SLOTS)


def build_tick(model: GanModel, temporal: bool, carry_c: int):
    """The pure batched tick the server jits — factored out so
    infer/export.py can seal the SAME math into a multi-stream
    ``.ir2rgb`` artifact (MultiStreamServer.from_artifact serves it
    without model code)."""
    # label_nc models ship raw class-id bytes: skip the [-1,1]
    # normalize (generate() one-hot encodes on device) — mirrors
    # stream.py's uint8 wire path
    norm = ((lambda u8: u8.astype(jnp.float32))
            if model.cfg.model.label_nc > 0 else _dev_normalize)
    if temporal:
        def tick(params, frames_u8, carry, reset, valid):
            x = norm(frames_u8)
            keep = ~reset[:, None, None, None]
            carry_in = jnp.where(keep, carry, 0.0)
            fake = model.generate(params, x, prev=carry_in, train=False)
            fake32 = fake.astype(jnp.float32)
            adv = jnp.concatenate([fake32, carry_in],
                                  axis=-1)[..., :carry_c]
            new_carry = jnp.where(valid[:, None, None, None],
                                  adv, carry_in)
            return _dev_quantize(fake), new_carry
    else:
        def tick(params, frames_u8, reset, valid):
            del reset, valid  # stateless model: masks are no-ops
            x = norm(frames_u8)
            return _dev_quantize(model.generate(params, x, train=False))
    return tick


def build_pool_tick(model: GanModel, carry_c: int):
    """Temporal tick over a carry POOL: the compiled batch (physical
    rows) is smaller than the attachable slot count, so per-row slot
    indices gather each row's carry from the (n_slots+1)-row pool and
    scatter the advanced carry back. Row semantics are unchanged from
    ``build_tick`` — reset/valid masks compose identically.

    Pad rows point at the pool's dedicated SCRATCH row (index n_slots)
    with valid=False: their write-back is the scratch row's own held
    value, so duplicate pad indices scatter identical data and the
    update stays deterministic."""
    base = build_tick(model, True, carry_c)

    def tick(params, frames_u8, pool, slot_idx, reset, valid):
        out, new_carry = base(params, frames_u8, pool[slot_idx],
                              reset, valid)
        return out, pool.at[slot_idx].set(new_carry)
    return tick


class MultiStreamServer:
    """Serve up to ``n_slots`` independent streams with one batched step.

    Usage::

        srv = MultiStreamServer(model, g_params, (512, 512), n_slots=8)
        a = srv.open(); b = srv.open()          # attach two streams
        outs = srv.step({a: ir_a, b: ir_b})     # {a: rgb_a, b: rgb_b}
        outs = srv.step({a: ir_a2})             # b skips, carry held
        srv.close(b)                            # slot b free for reuse

    Works for temporal models (per-slot carry) and single-frame models
    (pure batched apply). Frames are uint8 HWC (or float [-1,1]).
    """

    def __init__(self, model: GanModel, g_params,
                 frame_hw: Tuple[int, int], n_slots: int = 8,
                 mesh=None, physical_slots: Optional[int] = None):
        """``mesh``: optional Mesh with a 'data' axis — the slot axis
        shards across chips (each chip serves S/n_dev streams; params
        replicated). See ``parallel.dp_mesh``.

        ``physical_slots``: compiled batch size; defaults on TPU to the
        nearest measured-good size for n_slots CAPPED at the measured
        knee of 8 (see module docstring — a batch-5 step is SLOWER than
        a masked batch-8 step, and a batch-16 step is slower than two
        chained batch-8 ticks), and to n_slots elsewhere. May be smaller
        than n_slots: extra slots are then served by chunked round-robin
        ticks over a carry pool (one gather + one scatter per tick)."""
        cfgm = model.cfg.model
        self.model = model
        self.n_slots = int(n_slots)
        if physical_slots is None:
            physical_slots = (_good_physical_slots(self.n_slots)
                              if jax.default_backend() == "tpu"
                              else self.n_slots)
        if physical_slots < 1:
            raise ValueError(f"physical_slots={physical_slots} must "
                             f"be >= 1")
        self.physical_slots = int(physical_slots)
        self._pooled = self.physical_slots < self.n_slots
        if self._pooled and mesh is not None:
            raise ValueError(
                "physical_slots < n_slots (chunked round-robin) is "
                "single-chip knee logic — a mesh shards slots across "
                "chips instead; give each chip's server <= "
                f"{KNEE_SLOTS} slots")
        self.temporal = cfgm.model == "temporal"
        n_prev = (cfgm.n_frames_g - 1) if self.temporal else 0
        self.carry_c = cfgm.output_nc * n_prev
        h, w = frame_hw
        self.frame_hw = (h, w)
        # label models carry one id channel on the wire (one-hot happens
        # on device inside generate)
        self._label = cfgm.label_nc > 0
        self.in_nc = 1 if self._label else cfgm.input_nc
        self.out_nc = cfgm.output_nc
        self._free = list(range(self.n_slots))
        self._attached: set = set()
        self._pending_reset = np.zeros(self.n_slots, np.bool_)
        # non-pooled: carry row == slot id (physical >= n_slots).
        # pooled temporal: carries live in an (n_slots+1)-row pool whose
        # last row is scratch for pad rows; each tick gathers its chunk.
        self._carry = None
        if self.temporal:
            rows = (self.n_slots + 1 if self._pooled
                    else self.physical_slots)
            self._carry = jnp.zeros((rows, h, w, self.carry_c),
                                    jnp.float32)

        self._sharding = None
        if mesh is not None:
            from ir2rgb_tpu.parallel import batch_sharding, replicate
            rep, shard = replicate(mesh), batch_sharding(mesh)
            g_params = jax.device_put(g_params, rep)
            if self._carry is not None:
                self._carry = jax.device_put(self._carry, shard)
            self._sharding = shard
        self.g_params = g_params

        if self.temporal:
            tick = (build_pool_tick(model, self.carry_c) if self._pooled
                    else build_tick(model, True, self.carry_c))
            # donate ONLY the server-owned carry (HBM recycled for the
            # new carry). The frames buffer is caller-visible through
            # step_device — donating it would delete a device array the
            # caller may reuse next tick, for a few MB of uint8 savings.
            self._tick = jax.jit(tick, donate_argnums=(2,))
        else:
            self._tick = jax.jit(build_tick(model, False, self.carry_c))

    @classmethod
    def from_artifact(cls, path: str, n_slots: Optional[int] = None,
                      clamp: bool = False) -> "MultiStreamServer":
        """Serve a sealed multi-stream ``.ir2rgb`` artifact
        (infer/export.py::export_multistream_artifact): the same slot
        lifecycle and step() surface with NO model code behind it and no
        trace at startup — the StableHLO program goes straight to XLA
        (measured 7.2x cold-start cut on the chip for the single-stream
        artifact; a long-lived daemon restart rides the same path).

        The physical batch is sealed at export time; ``n_slots`` may
        cap the attachable streams below it (default: all of them). A
        cap above the sealed batch raises, unless ``clamp=True`` (the
        CLI's forgiving mode) clips it to the sealed batch instead."""
        from ir2rgb_tpu.infer.export import load_multistream_artifact
        tick, params, meta = load_multistream_artifact(path)
        self = cls.__new__(cls)
        self.model = None  # sealed program — no model code behind it
        self.physical_slots = int(meta["batch"])
        self.n_slots = int(n_slots if n_slots is not None
                           else meta["batch"])
        if self.n_slots < 1:
            raise ValueError(f"n_slots={self.n_slots} must be >= 1")
        if self.n_slots > self.physical_slots:
            if not clamp:
                raise ValueError(
                    f"n_slots={self.n_slots} exceeds the artifact's "
                    f"sealed batch {self.physical_slots}; re-export "
                    f"with more slots")
            self.n_slots = self.physical_slots
        self.temporal = bool(meta["temporal"])
        self.carry_c = int(meta["carry_c"])
        h, w = meta["frame_hw"]
        self.frame_hw = (h, w)
        self._label = meta.get("label_nc", 0) > 0
        self.in_nc = int(meta["input_nc"])
        self.out_nc = int(meta["output_nc"])
        self._free = list(range(self.n_slots))
        self._attached = set()
        self._pooled = False  # sealed batch is the physical batch
        self._pending_reset = np.zeros(self.n_slots, np.bool_)
        self._carry = (jnp.zeros((self.physical_slots, h, w, self.carry_c),
                                 jnp.float32) if self.temporal else None)
        self._sharding = None
        self.g_params = params
        self._tick = (jax.jit(tick, donate_argnums=(2,))
                      if self.temporal else jax.jit(tick))
        return self

    # -- slot lifecycle -------------------------------------------------

    @property
    def active_slots(self) -> Tuple[int, ...]:
        return tuple(sorted(self._attached))

    def open(self) -> int:
        """Attach a new stream; returns its slot id. The slot's carry is
        zeroed on its first tick (fresh temporal context)."""
        if not self._free:
            raise RuntimeError(
                f"all {self.n_slots} slots busy — close() one or build "
                f"the server with more slots")
        sid = self._free.pop(0)
        self._attached.add(sid)
        self._pending_reset[sid] = True
        return sid

    def close(self, sid: int) -> None:
        """Detach a stream; the slot becomes reusable."""
        self._attached.remove(sid)
        self._pending_reset[sid] = False
        self._free.append(sid)

    # -- serving --------------------------------------------------------

    def _wire_u8(self, a) -> np.ndarray:
        a = np.asarray(a)
        if a.dtype != np.uint8:
            # ONE shared conversion across all serving surfaces
            from ir2rgb_tpu.infer.stream import host_to_wire_u8
            a = host_to_wire_u8(a, self._label)
        return a

    def _dispatch_chunk(self, frames: Dict[int, np.ndarray], sids):
        """H2D + compute dispatch for <= physical_slots streams; returns
        (out_dev, row->sid map). Does not block — pair with _fetch."""
        h, w = self.frame_hw
        batch = np.zeros((self.physical_slots, h, w, self.in_nc), np.uint8)
        valid = np.zeros(self.physical_slots, np.bool_)
        reset = np.zeros(self.physical_slots, np.bool_)
        if self._pooled:
            # rows are chunk-local; pad rows gather the pool's scratch
            idx = np.full(self.physical_slots, self.n_slots, np.int32)
            rowmap = {}
            for row, sid in enumerate(sids):
                batch[row] = self._wire_u8(frames[sid])
                valid[row] = True
                reset[row] = self._pending_reset[sid]
                idx[row] = sid
                rowmap[row] = sid
        else:
            # carry row == slot id (physical >= n_slots)
            for sid in sids:
                batch[sid] = self._wire_u8(frames[sid])
                valid[sid] = True
                reset[sid] = self._pending_reset[sid]
            rowmap = {sid: sid for sid in sids}
        # one sharded H2D straight from host memory — asarray-then-
        # reshard would transfer the batch twice on the serving hot path
        frames_dev = (jnp.asarray(batch) if self._sharding is None
                      else jax.device_put(batch, self._sharding))
        if self.temporal and self._pooled:
            out, self._carry = self._tick(
                self.g_params, frames_dev, self._carry, jnp.asarray(idx),
                jnp.asarray(reset), jnp.asarray(valid))
        elif self.temporal:
            out, self._carry = self._tick(self.g_params, frames_dev,
                                          self._carry, jnp.asarray(reset),
                                          jnp.asarray(valid))
        else:
            out = self._tick(self.g_params, frames_dev,
                             jnp.asarray(reset), jnp.asarray(valid))
        for sid in sids:
            self._pending_reset[sid] = False  # reset consumed
        return out, rowmap

    def _dispatch(self, frames: Dict[int, np.ndarray]):
        """Dispatch one logical tick as one or more chunk ticks (chunked
        round-robin when more streams than physical rows — module
        docstring: chained knee-sized ticks beat one big batch). Returns
        a list of (out_dev, rowmap); all chunks are dispatched before
        any result is fetched, so chunk k+1's host prep overlaps chunk
        k's device compute."""
        unknown = set(frames) - self._attached
        if unknown:
            raise KeyError(f"frames for unattached slots {sorted(unknown)}")
        sids = sorted(frames)
        p = self.physical_slots
        return [self._dispatch_chunk(frames, sids[i:i + p])
                for i in range(0, len(sids), p)]

    @staticmethod
    def _fetch(parts) -> Dict[int, np.ndarray]:
        outs: Dict[int, np.ndarray] = {}
        for out, rowmap in parts:
            arr = np.asarray(jax.device_get(out))
            for row, sid in rowmap.items():
                outs[sid] = arr[row]
        return outs

    def step(self, frames: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
        """One synchronous tick: {slot: IR frame} -> {slot: uint8 RGB}.
        Slots without a frame this tick hold their carry (stream
        resumes seamlessly). An empty dict is free: no frame means no
        output and carries hold, so the batched forward is skipped."""
        if not frames:
            return {}
        return self._fetch(self._dispatch(frames))

    def ticks(self, feed: Iterable[Dict[int, np.ndarray]]
              ) -> Iterator[Dict[int, np.ndarray]]:
        """Pipelined serving loop over an iterable of per-tick frame
        dicts; yields output dicts with one tick of latency. Host prep +
        H2D of tick t overlap device compute of tick t-1 (same depth-1
        pipeline as ``StreamingGenerator.stream``; same outputs as
        sequential :meth:`step` calls — tested). Empty ticks yield {}
        without running the generator."""
        pending = None
        for frames in feed:
            out = self._dispatch(frames) if frames else None
            if pending is not None:
                yield self._fetch(pending)
            elif out is None and pending is None:
                # keep 1-tick latency alignment: empty tick, nothing
                # pending -> emit the empty output now
                yield {}
                continue
            pending = out
            if out is None:
                yield {}
                pending = None
        if pending is not None:
            yield self._fetch(pending)

    def step_device(self, frames_dev: jax.Array,
                    reset: Optional[jax.Array] = None,
                    valid: Optional[jax.Array] = None) -> jax.Array:
        """Device-in device-out full-physical-batch tick (no host sync) —
        the benchmark path; frames_dev carries ``physical_slots`` rows."""
        if reset is None:
            reset = jnp.zeros(self.physical_slots, bool)
        if valid is None:
            valid = jnp.ones(self.physical_slots, bool)
        if self._sharding is not None:
            frames_dev = jax.device_put(frames_dev, self._sharding)
        if self.temporal and self._pooled:
            # physical rows map to slots 0..physical_slots-1
            idx = jnp.arange(self.physical_slots, dtype=jnp.int32)
            out, self._carry = self._tick(self.g_params, frames_dev,
                                          self._carry, idx, reset, valid)
            return out
        if self.temporal:
            out, self._carry = self._tick(self.g_params, frames_dev,
                                          self._carry, reset, valid)
            return out
        return self._tick(self.g_params, frames_dev, reset, valid)
