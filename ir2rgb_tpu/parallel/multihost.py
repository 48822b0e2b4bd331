"""Multi-host (multi-process) data parallelism scaffolding.

One v5e host drives up to 8 chips with the single-controller setup in
``mesh.py`` — no launcher, no init. Beyond one host, JAX's multi-process
runtime applies: every host runs this same program, sees only its local
chips, and the meshes in ``mesh.py`` built from ``jax.devices()`` (which
lists ALL processes' devices after initialization) become global
automatically; XLA's collectives then ride ICI across the slice. The
reference has no analog (its DataParallel is single-process —
SURVEY.md §2.5); this is the TPU-native growth path past 8 chips.

Usage (same script on every host):

    from ir2rgb_tpu.parallel import multihost
    multihost.initialize()             # no-op on a single host
    mesh = data_parallel_mesh()        # now spans the whole slice
    batch = multihost.global_batch(local_batch, mesh)
    state, metrics = train_step(state, batch)   # unchanged

Each host feeds only its own shard of the global batch:
``global_batch`` assembles a global jax.Array from per-process local
data (`jax.make_array_from_process_local_data`), so the input pipeline
stays host-local — no host ever materializes the full global batch.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

from .mesh import batch_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-process JAX runtime; no-op single-host.

    On TPU pods the three arguments are auto-detected from the
    environment by ``jax.distributed.initialize``; pass them explicitly
    only for non-TPU or manual setups. Safe to call unconditionally —
    a single-process run (no coordinator configured, no pod metadata)
    returns without touching the runtime.
    """
    if jax.process_count() > 1:
        return  # already initialized
    has_cfg = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not has_cfg and jax.default_backend() != "tpu":
        return
    if not has_cfg and jax.default_backend() == "tpu":
        # single-host TPU (the dev harness): nothing to initialize
        try:
            if len(jax.devices()) <= 8 and jax.process_count() == 1:
                return
        except RuntimeError:
            pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch(local_batch: Any, mesh, temporal: bool = False) -> Any:
    """Assemble a globally-sharded batch from THIS process's local
    shard.

    ``local_batch``: host numpy arrays holding only this host's rows of
    the global batch (global_batch_size / process_count). Returns jax
    Arrays sharded over the mesh exactly like ``shard_batch`` produces
    on one host — the train step is identical in both settings.
    """
    def put(x):
        sh = batch_sharding(mesh, temporal=getattr(x, "ndim", 0) == 5)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, local_batch)
