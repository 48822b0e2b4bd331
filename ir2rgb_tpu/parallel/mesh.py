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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'; all others replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch axis sharded on
    'data' (the H2D boundary of the input pipeline)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
