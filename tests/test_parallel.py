"""Distributed-without-a-cluster tests (SURVEY.md §4.4): the sharded train
step on a fake 8-device CPU mesh must numerically match the 1-device run
for the same total batch.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.data.synthetic import synthetic_pair_batch
from ir2rgb_tpu.parallel import (
    batch_sharding,
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from ir2rgb_tpu.train import create_model


def _cfg():
    return Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=8, ndf=8),
        data=DataConfig(crop_size=32, batch_size=8),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(),
    )


def test_eight_fake_devices_available():
    assert jax.device_count() >= 8, (
        "conftest must set xla_force_host_platform_device_count=8")


def test_dp_matches_single_device():
    cfg = _cfg()
    model = create_model(cfg, steps_per_epoch=10)
    host = synthetic_pair_batch(8, 32)
    batch = {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
             "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}
    state = model.init_state(jax.random.PRNGKey(0), batch)

    # single-device run
    s1, m1 = jax.jit(model.train_step)(state, batch)

    # 8-device data-parallel run
    mesh = data_parallel_mesh(8)
    rep = replicate(mesh)
    state8 = jax.device_put(state, rep)
    batch8 = shard_batch(batch, mesh)
    step8 = jax.jit(model.train_step, in_shardings=(rep, batch_sharding(mesh)),
                    out_shardings=(rep, rep))
    s8, m8 = step8(state8, batch8)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-3,
                                   err_msg=k)

    # gradients agree tightly (all-reduce == single-device sum up to
    # reassociation noise)
    def grads_of(st, bt):
        def loss(params):
            total, _ = model.loss_and_metrics(params[0], params[1], bt,
                                              jax.random.PRNGKey(5),
                                              st.pool)
            return total
        return jax.grad(loss)((st.g_params, st.d_params))

    g1 = jax.device_get(jax.jit(grads_of)(state, batch))
    g8 = jax.device_get(
        jax.jit(grads_of, in_shardings=(rep, batch_sharding(mesh)),
                out_shardings=rep)(state8, batch8))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # params after one Adam step: first-step update is ~sign(g), which
    # amplifies reassociation noise to O(lr) — loose bound only
    l1 = jax.tree.leaves(jax.device_get(s1.g_params))
    l8 = jax.tree.leaves(jax.device_get(s8.g_params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_sharded_batch_layout():
    mesh = data_parallel_mesh(8)
    x = jnp.zeros((8, 4, 4, 3))
    xs = shard_batch({"a": x}, mesh)["a"]
    assert xs.sharding.num_devices == 8


# ---------------------------------------------------------------------------
# spatial partitioning (dp x sp mesh: image rows sharded over 'spatial')
# ---------------------------------------------------------------------------

def test_spatial_sharded_generate_matches_single_device():
    """H-sharded coarse-to-fine generator == single-device output: the
    SPMD partitioner's halo exchanges + IN all-reduces must be exact up
    to float reassociation."""
    from ir2rgb_tpu.parallel import dp_sp_mesh

    cfg = Config(
        model=ModelConfig(model="pix2pixhd", net_g="local", ngf=8,
                          n_downsample_global=2, n_blocks_global=2,
                          n_blocks_local=1),
        loss=LossConfig(no_vgg_loss=True),
        data=DataConfig(crop_size=64),
    )
    model = create_model(cfg, steps_per_epoch=10)
    g = model.g_init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 2 - 1,
                    jnp.float32)
    ref = jax.jit(lambda p, a: model.generate(p, a, train=False))(g, x)

    mesh = dp_sp_mesh(1, 8)
    rep, xsh = replicate(mesh), batch_sharding(mesh)
    out = jax.jit(lambda p, a: model.generate(p, a, train=False),
                  in_shardings=(rep, xsh), out_shardings=xsh)(
        jax.device_put(g, rep), jax.device_put(x, xsh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dp_sp_train_step_matches_single_device():
    """One fused G+D train step on a 2x4 (data, spatial) mesh produces
    the same losses as the single-device run."""
    from ir2rgb_tpu.parallel import dp_sp_mesh

    cfg = _cfg()
    model = create_model(cfg, steps_per_epoch=10)
    host = synthetic_pair_batch(8, 32)
    batch = {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
             "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    _, m1 = jax.jit(model.train_step)(state, batch)

    mesh = dp_sp_mesh(2, 4)
    rep = replicate(mesh)
    state8 = jax.device_put(state, rep)
    batch8 = shard_batch(batch, mesh)
    _, m8 = jax.jit(model.train_step,
                    in_shardings=(rep, batch_sharding(mesh)),
                    out_shardings=(rep, rep))(state8, batch8)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-3,
                                   err_msg=k)


def test_spatial_shard_batch_layout():
    from jax.sharding import PartitionSpec as P
    from ir2rgb_tpu.parallel import dp_sp_mesh

    mesh = dp_sp_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)
    frame = jnp.zeros((2, 8, 8, 3))       # image batch: H on 'spatial'
    clip = jnp.zeros((2, 3, 8, 8, 3))     # temporal: T replicated
    out = shard_batch({"a": frame, "seq": clip}, mesh)
    assert out["a"].sharding.spec == P("data", "spatial")
    assert out["seq"].sharding.spec == P("data", None, "spatial")


def test_streaming_generator_spatial_mesh():
    """StreamingGenerator on a dp_sp mesh matches the unsharded stream
    frame-for-frame (temporal carry stays sharded on device)."""
    from ir2rgb_tpu.parallel import dp_sp_mesh

    cfg = Config(
        model=ModelConfig(model="temporal", net_g="resnet_6blocks",
                          ngf=8, n_frames_g=2),
        loss=LossConfig(no_vgg_loss=True),
        data=DataConfig(crop_size=32),
    )
    model = create_model(cfg, steps_per_epoch=10)
    g = model.g_init(jax.random.PRNGKey(0))
    frames = [jnp.asarray(np.random.RandomState(i).rand(1, 32, 32, 3) * 2
                          - 1, jnp.float32) for i in range(3)]

    from ir2rgb_tpu.infer.stream import StreamingGenerator
    plain = StreamingGenerator(model, g, (32, 32))
    sharded = StreamingGenerator(model, g, (32, 32), mesh=dp_sp_mesh(1, 8))
    for f in frames:
        # push_device donates its input buffer — hand each stream its
        # own copy of the frame
        a = np.asarray(plain.push_device(jnp.array(f)))
        b = np.asarray(sharded.push_device(jnp.array(f)))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_multihost_global_batch_single_process():
    """multihost.global_batch on a single process must equal shard_batch
    (the per-process local data IS the whole batch), and initialize()
    must be a safe no-op without a coordinator."""
    from ir2rgb_tpu.parallel import multihost

    multihost.initialize()  # no-op: no coordinator configured, CPU
    assert jax.process_count() == 1

    mesh = data_parallel_mesh(8)
    x = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    a = multihost.global_batch({"a": x}, mesh)["a"]
    b = shard_batch({"a": jnp.asarray(x)}, mesh)["a"]
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from ir2rgb_tpu.parallel import dp_sp_mesh
    mesh2 = dp_sp_mesh(2, 4)
    a2 = multihost.global_batch({"a": x}, mesh2)["a"]
    b2 = shard_batch({"a": jnp.asarray(x)}, mesh2)["a"]
    assert a2.sharding == b2.sharding
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def _spawn_worker(coord, nproc, pid, n_local_devices, repo_root, sp=1):
    import subprocess
    import sys

    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": repo_root,  # NOT .axon_site — CPU only
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (f"--xla_force_host_platform_device_count="
                      f"{n_local_devices}"),
    }
    return subprocess.Popen(
        [sys.executable, os.path.join(repo_root, "tests",
                                      "_multihost_worker.py"),
         coord, str(nproc), str(pid), str(sp)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=repo_root)


def _worker_metrics(proc, timeout=600):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{err[-3000:]}"
    for line in out.splitlines():
        if line.startswith("METRICS "):
            import json
            return json.loads(line[len("METRICS "):])
    raise AssertionError(f"no METRICS line in worker output:\n{out}\n{err}")


def test_multihost_two_process_real():
    """The SUCCESS path of parallel/multihost.py, for real (round-2
    verdict missing #3): two OS processes, each with 4 virtual CPU
    devices, jax.distributed.initialize over a local coordinator, a
    global 8-device mesh, per-process local shards assembled via
    multihost.global_batch, two fused G+D train steps — and the
    replicated metrics must agree between the processes AND match the
    single-process 8-device run of the same global batch."""
    import socket

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    p0 = _spawn_worker(coord, 2, 0, 4, repo_root)
    p1 = _spawn_worker(coord, 2, 1, 4, repo_root)
    m0 = _worker_metrics(p0)
    m1 = _worker_metrics(p1)

    ref = _worker_metrics(_spawn_worker(coord, 1, 0, 8, repo_root))

    assert m0["_step"] == m1["_step"] == ref["_step"] == 2
    assert set(m0) == set(m1) == set(ref)
    for k in ref:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, atol=1e-6,
                                   err_msg=f"{k}: processes disagree")
        np.testing.assert_allclose(m0[k], ref[k], rtol=1e-4, atol=1e-5,
                                   err_msg=f"{k}: 2-process vs 1-process")


def test_multihost_two_process_spatial():
    """DP x SP spanning OS processes: 2 processes x 4 devices on a
    dp2 x sp4 mesh — each process owns one dp row, image rows shard over
    its own devices, and XLA's conv halo exchanges cross the process
    boundary. Metrics must match the 2-process pure-DP run's reference
    (the model is element-exact under spatial sharding,
    test_spatial_partitioning_exactness)."""
    import socket

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    p0 = _spawn_worker(coord, 2, 0, 4, repo_root, sp=4)
    p1 = _spawn_worker(coord, 2, 1, 4, repo_root, sp=4)
    m0 = _worker_metrics(p0)
    m1 = _worker_metrics(p1)
    # single-process reference on the same dp2 x sp4 mesh
    ref = _worker_metrics(_spawn_worker(coord, 1, 0, 8, repo_root, sp=4))

    assert m0["_step"] == m1["_step"] == ref["_step"] == 2
    for k in ref:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, atol=1e-6,
                                   err_msg=f"{k}: processes disagree")
        np.testing.assert_allclose(m0[k], ref[k], rtol=1e-4, atol=1e-5,
                                   err_msg=f"{k}: 2-proc vs 1-proc dpxsp")


def test_multihost_initialize_after_jax_raises_when_required():
    """The initialize-before-JAX ordering hazard must be FATAL on an
    explicitly requested multihost run (require=True — what the train
    CLI passes), never a silent single-process fallback."""
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.devices()\n"  # finalizes the backend FIRST
        "from ir2rgb_tpu.parallel import multihost\n"
        "try:\n"
        "    multihost.initialize(coordinator_address='localhost:1',\n"
        "                         num_processes=2, process_id=0,\n"
        "                         require=True)\n"
        "except Exception as e:\n"
        "    print('RAISED', type(e).__name__)\n"
        "else:\n"
        "    print('NO-RAISE')\n"
    )
    env = {"PATH": os.environ.get("PATH", "/usr/bin:/bin"),
           "HOME": os.environ.get("HOME", "/root"),
           "PYTHONPATH": repo_root, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300,
                       cwd=repo_root)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RAISED" in r.stdout, r.stdout + r.stderr[-1000:]


def test_dp_sp_mesh_rejects_oversized_sp():
    """sp > visible devices must fail at the call site, not build an
    empty (0, sp) mesh that errors obscurely later (advisor round-2)."""
    from ir2rgb_tpu.parallel import dp_sp_mesh

    with pytest.raises(ValueError, match="exceeds"):
        dp_sp_mesh(sp=16)  # 8 visible devices
    with pytest.raises(ValueError, match="sp must be"):
        dp_sp_mesh(sp=0)


def test_spatial_batch_sharding_skips_low_rank_leaves():
    """On a (data, spatial) mesh, only rank-4/5 image leaves shard H on
    'spatial'; a rank-3 leaf (e.g. instance-id maps) and rank-1 labels
    shard batch only (advisor round-2: a rank-2 feature leaf must not
    have its feature dim sharded as image rows)."""
    from jax.sharding import PartitionSpec as P

    from ir2rgb_tpu.parallel import dp_sp_mesh, shard_batch

    mesh = dp_sp_mesh(2, 4)
    batch = {
        "img": np.zeros((2, 8, 8, 3), np.float32),
        "inst": np.zeros((2, 8, 8), np.int32),
        "label": np.zeros((2,), np.int32),
    }
    out = shard_batch(batch, mesh)
    assert out["img"].sharding.spec == P("data", "spatial")
    assert out["inst"].sharding.spec == P("data")
    assert out["label"].sharding.spec == P("data")
