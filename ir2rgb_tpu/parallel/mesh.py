"""Device mesh and sharding — the data-parallel substrate.

Replaces the reference's ``torch.nn.DataParallel`` single-process
scatter/gather (SURVEY.md §2.5 — the only parallelism the reference has)
with the TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over the
slice's chips, batches sharded on the ``data`` axis via ``NamedSharding``,
parameters/optimizer state replicated, and gradient all-reduce emitted by
XLA as ICI collectives from the sharding constraints (BASELINE.json:11).

No explicit ``psum`` calls are needed in the train step: with batch inputs
sharded on ``data`` and params replicated, XLA's SPMD partitioner inserts
the all-reduce over ICI automatically. (SURVEY.md §7 stage 7.)

Beyond DP, the one extra axis that genuinely pays for this family is
**spatial partitioning (SP)**: shard the image H axis over a second mesh
axis so one frame's rows live on several chips. XLA's SPMD partitioner
turns the convolutions' cross-shard reads into halo exchanges
(collective-permute over ICI) and the instance-norm H,W reductions into
all-reduces — verified element-exact vs the single-device run on the
virtual mesh (tests/test_parallel.py). That is how >1024p frames that
blow one chip's HBM (or one chip's latency budget) serve on a slice:
``dp_sp_mesh(dp, sp)`` + the same jitted step, no model changes.

Scaling note (SURVEY.md §2.5): TP/PP/EP are deliberately absent — these
models are <=50M params, orders of magnitude below the threshold where
intra-layer sharding pays; the "long sequence" analog (video time) is
handled by streaming scan inference at O(1) memory, not ring/Ulysses
attention (there is no attention anywhere in the family).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_devices: int = 0,
                       devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def dp_sp_mesh(dp: int = 0, sp: int = 1,
               devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2-D ``(data, spatial)`` mesh: batch on 'data', image rows on
    'spatial'. ``dp=0`` uses all visible devices / ``sp``. ``sp`` should
    map to an ICI-contiguous group (the default device order on a TPU
    slice is) — halo exchanges ride neighbour links."""
    if devices is None:
        devices = jax.devices()
    if sp < 1:
        raise ValueError(f"sp must be >= 1, got {sp}")
    if dp < 0:
        # dp=-1 would silently build a wrong-sized mesh via reshape(-1,sp)
        raise ValueError(f"dp must be >= 0 (0 = all devices / sp), "
                         f"got {dp}")
    if not dp:
        dp = len(devices) // sp
        if dp == 0:
            raise ValueError(
                f"sp = {sp} exceeds {len(devices)} visible devices "
                f"(dp would be 0)")
    n = dp * sp
    if n > len(devices):
        raise ValueError(f"dp*sp = {dp}*{sp} = {n} exceeds "
                         f"{len(devices)} visible devices")
    return Mesh(np.asarray(devices[:n]).reshape(dp, sp),
                axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, temporal: bool = False,
                   ndim: int = 4) -> NamedSharding:
    """Batch sharding for ``mesh``: batch axis over 'data', and — when
    the mesh has a 'spatial' axis — image rows (H) over 'spatial'. For
    ``temporal`` batches (B, T, H, W, C) the time axis stays replicated
    and H is dim 2. Only rank-4/5 leaves are image-shaped; lower-rank
    leaves (e.g. rank-3 instance-id maps, rank-1 labels) shard the batch
    axis only — P('data','spatial') on a rank-2 non-image leaf would
    silently shard its feature dim as image rows."""
    if "spatial" in mesh.axis_names and ndim in (4, 5):
        spec = (P("data", None, "spatial") if temporal
                else P("data", "spatial"))
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch axis sharded on
    'data' (the H2D boundary of the input pipeline). On a (data,
    spatial) mesh, rank-4 leaves additionally shard H on 'spatial'
    (rank-5 temporal leaves shard dim 2 — time stays replicated)."""
    def put(x):
        nd = getattr(x, "ndim", 0)
        return jax.device_put(
            x, batch_sharding(mesh, temporal=nd == 5, ndim=nd))
    return jax.tree.map(put, batch)
