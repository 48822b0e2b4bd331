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
               process_id: Optional[int] = None,
               require: bool = False) -> None:
    """Bring up the multi-process JAX runtime.

    MUST run before any other JAX API call — the first device query
    finalizes the local backend topology, after which distributed
    initialization is rejected (this function therefore does no
    ``jax.devices()``/``process_count()`` probing of its own, and the
    train CLI calls it straight after config parsing). On TPU pods all
    three arguments auto-detect from the pod metadata; pass them
    explicitly (or set JAX_COORDINATOR_ADDRESS) elsewhere. So the same
    ``--train.multihost`` script runs unchanged on one host, a run with
    NO explicit configuration where auto-detection finds no cluster
    downgrades the failure to a warning and stays single-process; any
    explicitly-configured failure raises.

    ``require=True`` treats any initialization failure as fatal — the
    train CLI passes it when ``cfg.train.multihost`` is set, because a
    user who asked for multihost and silently got N independent
    single-process runs would have every host clobbering the same
    run_dir/checkpoints (advisor round-2 medium finding).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception as e:
        explicit = (require
                    or coordinator_address is not None
                    or num_processes is not None
                    or process_id is not None
                    or os.environ.get("JAX_COORDINATOR_ADDRESS"))
        if explicit:
            raise
        import warnings
        warnings.warn(
            f"multihost.initialize: no cluster detected; continuing "
            f"single-process ({type(e).__name__}: {e})")


def global_batch(local_batch: Any, mesh, temporal: bool = False) -> Any:
    """Assemble a globally-sharded batch from THIS process's local
    shard.

    ``local_batch``: host numpy arrays holding only this host's rows of
    the global batch (global_batch_size / process_count). Returns jax
    Arrays sharded over the mesh exactly like ``shard_batch`` produces
    on one host — the train step is identical in both settings.
    """
    def put(x):
        nd = getattr(x, "ndim", 0)
        sh = batch_sharding(mesh, temporal=nd == 5, ndim=nd)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, local_batch)
