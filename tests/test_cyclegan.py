"""CycleGAN (unpaired) model family tests: loss wiring against directly
recomputed family formulas, sg-wall isolation, the unaligned data path,
independent (unpaired) augmentation, and CLI end-to-end."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.config import (
    Config,
    DataConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
from ir2rgb_tpu.train import create_model


def cycle_cfg(**model_kw):
    defaults = dict(model="cycle_gan", net_g="resnet_6blocks",
                    net_d="n_layers", ngf=4, ndf=4, get_interm_feat=False)
    defaults.update(model_kw)
    return Config(
        model=ModelConfig(**defaults),
        data=DataConfig(dataset_mode="unaligned", crop_size=32,
                        batch_size=2),
        loss=LossConfig(no_vgg_loss=True, no_gan_feat_loss=True,
                        lambda_l1=0.0, pool_size=0),
        train=TrainConfig(niter=1, niter_decay=1),
    )


def _rand_batch(bsz=2, size=32, seed=0):
    rs = np.random.RandomState(seed)
    return {"a": jnp.asarray(rs.rand(bsz, size, size, 3) * 2 - 1,
                             jnp.float32),
            "b": jnp.asarray(rs.rand(bsz, size, size, 3) * 2 - 1,
                             jnp.float32)}


def test_cycle_train_step_runs_and_metrics():
    cfg = cycle_cfg()
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, pool_size=4))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _rand_batch()
    state = model.init_state(jax.random.PRNGKey(0), batch)
    assert sorted(state.g_params) == ["G_A", "G_B"]
    assert sorted(state.d_params) == ["D_A", "D_B"]
    state, metrics = jax.jit(model.train_step)(state, batch)
    for k in ("G_A", "G_B", "Cyc_A", "Cyc_B", "Idt_A", "Idt_B",
              "D_A", "D_B"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1
    # both domain pools saw this batch's fakes
    assert int(state.pool["fake_a"].count) == 2
    assert int(state.pool["fake_b"].count) == 2


def test_cycle_losses_match_family_formulas():
    """Recompute every loss term directly from the model's own network
    applies (LSGAN + L1 compositions, the family's cycle_gan objective)
    and assert the metrics dict matches — catches any mis-wiring of
    which generator/discriminator feeds which term."""
    cfg = cycle_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = _rand_batch()
    a, b = batch["a"], batch["b"]
    state = model.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(7)
    total, (metrics, _) = model.loss_and_metrics(
        state.g_params, state.d_params, batch, rng, state.pool)

    gp, dp = state.g_params, state.d_params
    k_da, k_db, _, _ = jax.random.split(rng, 4)
    fake_b = model.g_apply(gp["G_A"], a, train=True, rng=k_da)
    fake_a = model.gb_apply(gp["G_B"], b, train=True, rng=k_db)
    rec_a = model.gb_apply(gp["G_B"], fake_b, train=True,
                           rng=jax.random.fold_in(k_db, 1))
    rec_b = model.g_apply(gp["G_A"], fake_a, train=True,
                          rng=jax.random.fold_in(k_da, 1))

    def lsgan(logits, target):
        return jnp.mean((logits.astype(jnp.float32) - target) ** 2)

    def l1(x, y):
        return jnp.mean(jnp.abs(x.astype(jnp.float32)
                                - y.astype(jnp.float32)))

    expect = {
        "G_A": lsgan(model.d_apply(dp["D_A"], fake_b)[0][-1], 1.0),
        "G_B": lsgan(model.db_apply(dp["D_B"], fake_a)[0][-1], 1.0),
        "Cyc_A": 10.0 * l1(rec_a, a),
        "Cyc_B": 10.0 * l1(rec_b, b),
        "D_A": 0.5 * (lsgan(model.d_apply(dp["D_A"], b)[0][-1], 1.0)
                      + lsgan(model.d_apply(dp["D_A"], fake_b)[0][-1],
                              0.0)),
        "D_B": 0.5 * (lsgan(model.db_apply(dp["D_B"], a)[0][-1], 1.0)
                      + lsgan(model.db_apply(dp["D_B"], fake_a)[0][-1],
                              0.0)),
    }
    idt_a = model.g_apply(gp["G_A"], b, train=True,
                          rng=jax.random.fold_in(k_da, 2))
    idt_b = model.gb_apply(gp["G_B"], a, train=True,
                           rng=jax.random.fold_in(k_db, 2))
    expect["Idt_A"] = 10.0 * 0.5 * l1(idt_a, b)
    expect["Idt_B"] = 10.0 * 0.5 * l1(idt_b, a)
    for k, v in expect.items():
        np.testing.assert_allclose(float(metrics[k]), float(v),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(
        float(total), float(sum(expect.values())), rtol=1e-5)


def test_cycle_sg_walls():
    """G-side loss gives the discriminators zero gradient, and D-side
    loss gives the generators zero gradient (the fused-step sg-wall
    construction carried over to the two-domain objective)."""
    cfg = cycle_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = _rand_batch()
    state = model.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(3)

    def part(g_params, d_params, which):
        _, (m, _) = model.loss_and_metrics(g_params, d_params, batch,
                                           rng, state.pool)
        return m[which]

    d_from_g = jax.grad(lambda d: part(state.g_params, d, "_loss_g"))(
        state.d_params)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree.leaves(d_from_g))
    g_from_d = jax.grad(lambda g: part(g, state.d_params, "_loss_d"))(
        state.g_params)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree.leaves(g_from_d))
    # and the real loss DOES reach all four nets
    g_grads = jax.grad(lambda g: part(g, state.d_params, "_loss_g"))(
        state.g_params)
    d_grads = jax.grad(lambda d: part(state.g_params, d, "_loss_d"))(
        state.d_params)
    for net in ("G_A", "G_B"):
        assert any(float(jnp.abs(x).max()) > 0
                   for x in jax.tree.leaves(g_grads[net])), net
    for net in ("D_A", "D_B"):
        assert any(float(jnp.abs(x).max()) > 0
                   for x in jax.tree.leaves(d_grads[net])), net


def test_cycle_identity_requires_matching_channels():
    with pytest.raises(ValueError, match="lambda_identity"):
        create_model(cycle_cfg(input_nc=1), steps_per_epoch=10)
    # lambda_identity=0 lifts the constraint; Idt metrics disappear
    cfg = cycle_cfg(input_nc=1)
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss,
                                               lambda_identity=0.0))
    model = create_model(cfg, steps_per_epoch=10)
    rs = np.random.RandomState(0)
    batch = {"a": jnp.asarray(rs.rand(2, 32, 32, 1) * 2 - 1, jnp.float32),
             "b": jnp.asarray(rs.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert "Idt_A" not in metrics
    assert model.generate(state.g_params, batch["a"]).shape[-1] == 3
    assert model.generate(state.g_params, batch["b"],
                          direction="BtoA").shape[-1] == 1


def test_cycle_grad_accum_and_ema_compose():
    """The inherited train_step machinery works on the composite trees:
    grad_accum scans micro-batches through both domain pools, and the
    EMA shadows both generators."""
    cfg = cycle_cfg()
    cfg = cfg.replace(
        loss=dataclasses.replace(cfg.loss, pool_size=8),
        train=dataclasses.replace(cfg.train, grad_accum=2,
                                  ema_decay=0.5),
        data=dataclasses.replace(cfg.data, batch_size=4))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _rand_batch(bsz=4)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    assert sorted(state.ema_g) == ["G_A", "G_B"]
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["Cyc_A"]))
    assert int(state.pool["fake_a"].count) == 4
    assert int(state.pool["fake_b"].count) == 4
    expect = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p,
                          model.init_state(jax.random.PRNGKey(0),
                                           batch).g_params,
                          state.g_params)
    for e, x in zip(jax.tree.leaves(state.ema_g),
                    jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)


def test_cycle_overfit_smoke():
    """A few steps on one fixed batch: the cycle reconstruction must
    improve (the G update visibly optimizes the composite objective)."""
    cfg = cycle_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = _rand_batch()
    state = model.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(model.train_step)
    first = None
    for _ in range(12):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["Cyc_A"] + metrics["Cyc_B"])
    last = float(metrics["Cyc_A"] + metrics["Cyc_B"])
    assert last < first, (first, last)


def test_cycle_objective_torch_parity():
    """Gold-standard check: import four torch nets (the parity-suite
    fixtures) into the cycle model and match the FULL objective — every
    loss term — against a direct torch implementation of the family's
    cycle_gan_model update math."""
    import torch
    import torch_refs
    from ir2rgb_tpu.checkpoint import import_discriminator, import_generator

    torch.manual_seed(0)
    tga = torch_refs.ResnetGenerator(ngf=8, n_blocks=6,
                                     norm="instance").eval()
    tgb = torch_refs.ResnetGenerator(ngf=8, n_blocks=6,
                                     norm="instance").eval()
    tda = torch_refs.NLayerDiscriminator(input_nc=3, ndf=8,
                                         get_interm_feat=False,
                                         padw=1).eval()
    tdb = torch_refs.NLayerDiscriminator(input_nc=3, ndf=8,
                                         get_interm_feat=False,
                                         padw=1).eval()

    cfg = cycle_cfg(ngf=8, ndf=8)
    model = create_model(cfg, steps_per_epoch=10)
    assert model.disc_cfg.d_pad == 1  # the family's pix2pix convention

    def sd(t):
        return {k: v.numpy() for k, v in t.state_dict().items()}

    g_params = {
        "G_A": import_generator(sd(tga), model.gen_cfg, n_blocks=6),
        "G_B": import_generator(sd(tgb), model.gen_cfg_b, n_blocks=6),
    }
    d_params = {
        "D_A": import_discriminator(sd(tda), model.disc_cfg),
        "D_B": import_discriminator(sd(tdb), model.disc_cfg_b),
    }

    a_t = torch.randn(2, 3, 32, 32)
    b_t = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        fake_b = tga(a_t)
        fake_a = tgb(b_t)
        rec_a = tgb(fake_b)
        rec_b = tga(fake_a)
        idt_a = tga(b_t)
        idt_b = tgb(a_t)
        mse = torch.nn.functional.mse_loss
        l1 = torch.nn.functional.l1_loss

        def d_out(d, x):
            return d(x)[0]

        expect = {
            "G_A": mse(d_out(tda, fake_b),
                       torch.ones_like(d_out(tda, fake_b))),
            "G_B": mse(d_out(tdb, fake_a),
                       torch.ones_like(d_out(tdb, fake_a))),
            "Cyc_A": 10.0 * l1(rec_a, a_t),
            "Cyc_B": 10.0 * l1(rec_b, b_t),
            "Idt_A": 10.0 * 0.5 * l1(idt_a, b_t),
            "Idt_B": 10.0 * 0.5 * l1(idt_b, a_t),
            "D_A": 0.5 * (mse(d_out(tda, b_t),
                              torch.ones_like(d_out(tda, b_t)))
                          + mse(d_out(tda, fake_b),
                                torch.zeros_like(d_out(tda, fake_b)))),
            "D_B": 0.5 * (mse(d_out(tdb, a_t),
                              torch.ones_like(d_out(tdb, a_t)))
                          + mse(d_out(tdb, fake_a),
                                torch.zeros_like(d_out(tdb, fake_a)))),
        }

    batch = {"a": jnp.asarray(a_t.numpy().transpose(0, 2, 3, 1)),
             "b": jnp.asarray(b_t.numpy().transpose(0, 2, 3, 1))}
    pool = create_model(cfg, steps_per_epoch=10).init_state(
        jax.random.PRNGKey(0), batch).pool
    _, (metrics, _) = model.loss_and_metrics(
        g_params, d_params, batch, jax.random.PRNGKey(1), pool)
    for k, v in expect.items():
        np.testing.assert_allclose(float(metrics[k]), float(v),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_cycle_dp_matches_single_device():
    """The composite G_A/G_B/D_A/D_B trees replicate over a DP mesh and
    the batch-sharded fused step reproduces the single-device metrics
    and gradients (XLA all-reduce == single-device sum)."""
    from ir2rgb_tpu.parallel import (
        batch_sharding,
        data_parallel_mesh,
        replicate,
        shard_batch,
    )
    cfg = cycle_cfg()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=8))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _rand_batch(bsz=8)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    s1, m1 = jax.jit(model.train_step)(state, batch)

    mesh = data_parallel_mesh(8)
    rep = replicate(mesh)
    state8 = jax.device_put(state, rep)
    batch8 = shard_batch(batch, mesh)
    s8, m8 = jax.jit(model.train_step,
                     in_shardings=(rep, batch_sharding(mesh)),
                     out_shardings=(rep, rep))(state8, batch8)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-3,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.g_params)),
                    jax.tree.leaves(jax.device_get(s8.g_params))):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_cycle_trainer_fit_and_resume(tmp_path):
    """The real Trainer over the composite trees: fit on the 8-device
    mesh (dict-of-pools + EMA-of-both-Gs through orbax), then
    continue_train picks the state back up."""
    from ir2rgb_tpu.train import Trainer

    def mk_cfg(**train_kw):
        defaults = dict(name="cyc_trainer", checkpoints_dir=str(tmp_path),
                        niter=1, niter_decay=0, print_freq=2,
                        save_latest_freq=100, ema_decay=0.5)
        defaults.update(train_kw)
        cfg = cycle_cfg()
        return cfg.replace(
            data=dataclasses.replace(cfg.data, batch_size=8),
            loss=dataclasses.replace(cfg.loss, pool_size=4),
            train=TrainConfig(**defaults))

    def batches(n):
        b = _rand_batch(bsz=8)
        for _ in range(n):
            yield b

    cfg = mk_cfg()
    model = create_model(cfg, steps_per_epoch=3)
    trainer = Trainer(model, cfg)
    state = trainer.init_or_restore(jax.random.PRNGKey(0),
                                    next(batches(1)))
    state = trainer.fit(state, batches(10))
    assert int(jax.device_get(state.step)) == 3
    trainer.ckpt.close()

    cfg2 = mk_cfg(continue_train=True, niter=2)
    model2 = create_model(cfg2, steps_per_epoch=3)
    trainer2 = Trainer(model2, cfg2)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(1),
                                      next(batches(1)))
    assert int(jax.device_get(state2.step)) == 3
    assert sorted(state2.ema_g) == ["G_A", "G_B"]
    assert int(jax.device_get(state2.pool["fake_a"].count)) > 0
    state2 = trainer2.fit(state2, batches(10))
    assert int(jax.device_get(state2.step)) == 6
    trainer2.ckpt.close()


def test_cycle_export_g_cli(tmp_path):
    """ir2rgb-convert export-g --net G_B deploys the B->A generator of a
    cycle run back into the torch reference stack (strict load, matching
    outputs)."""
    import torch
    import torch_refs
    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.cli.convert import main as convert_main
    from ir2rgb_tpu.config import save_config

    cfg = cycle_cfg()
    model = create_model(cfg, steps_per_epoch=1)
    batch = _rand_batch()
    state = model.init_state(jax.random.PRNGKey(4), batch)
    run = str(tmp_path / "run")
    save_config(cfg, os.path.join(run, "config.json"))
    mgr = CheckpointManager(os.path.join(run, "ckpt"), async_save=False)
    mgr.save(1, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    tpl = torch_refs.ResnetGenerator(ngf=4, n_blocks=6, norm="instance")
    tpl_path = str(tmp_path / "tpl_net_G.pth")
    torch.save(tpl.state_dict(), tpl_path)
    out_path = str(tmp_path / "exported_net_G_B.pth")
    rc = convert_main(["export-g", "--run", run, "--template", tpl_path,
                       "--net", "G_B", "--out", out_path])
    assert rc == 0 and os.path.exists(out_path)

    tpl.load_state_dict(torch.load(out_path, weights_only=True),
                        strict=True)
    tpl.eval()
    torch.manual_seed(0)
    x_t = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        y_t = tpl(x_t).numpy()
    y_j = np.asarray(model.gb_apply(
        jax.device_get(state.g_params)["G_B"],
        jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(y_j.transpose(0, 3, 1, 2), y_t, atol=1e-4)


# ---------------------------------------------------------------------------
# Unaligned data path
# ---------------------------------------------------------------------------

def _write_unaligned(root, na=6, nb=4, size=40):
    from PIL import Image
    os.makedirs(os.path.join(root, "trainA"), exist_ok=True)
    os.makedirs(os.path.join(root, "trainB"), exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(na):
        img = np.full((size, size, 3), i, np.uint8)  # identifiable value
        Image.fromarray(img).save(
            os.path.join(root, "trainA", f"a{i:03d}.png"))
    for i in range(nb):
        img = np.full((size, size, 3), 100 + i, np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "trainB", f"b{i:03d}.png"))
    del rs


def test_unaligned_loader_draws_independent_b(tmp_path):
    from ir2rgb_tpu.data import DataLoader
    root = str(tmp_path / "data")
    _write_unaligned(root)
    cfg = Config(data=DataConfig(dataroot=root, dataset_mode="unaligned",
                                 preprocess="none", batch_size=2,
                                 load_size=40, crop_size=32))
    loader = DataLoader(cfg)
    assert len(loader) == 3  # 6 A-frames / batch 2 (A side drives epochs)
    batches = list(loader.epoch())
    assert len(batches) == 3
    a_vals = sorted(int(b["a"][i, 0, 0, 0]) for b in batches
                    for i in range(2))
    assert a_vals == [0, 1, 2, 3, 4, 5]  # every A frame exactly once
    for b in batches:
        assert b["a"].shape == (2, 40, 40, 3)
        # B values come from the B pool (>= 100), drawn independently
        assert all(int(v) >= 100 for v in b["b"][:, 0, 0, 0])


def test_unaligned_serial_batches_fixed_pairing(tmp_path):
    from ir2rgb_tpu.data import DataLoader
    root = str(tmp_path / "data")
    _write_unaligned(root)
    cfg = Config(data=DataConfig(dataroot=root, dataset_mode="unaligned",
                                 preprocess="none", batch_size=2,
                                 load_size=40, serial_batches=True))
    loader = DataLoader(cfg)
    batches = list(loader.epoch())
    # serial: A index j pairs with B index j % len(B) — reproducible
    for bi, b in enumerate(batches):
        for k in range(2):
            j = bi * 2 + k
            assert int(b["a"][k, 0, 0, 0]) == j
            assert int(b["b"][k, 0, 0, 0]) == 100 + (j % 4)


def test_unaligned_btoa_swaps_domains(tmp_path):
    from ir2rgb_tpu.data import DataLoader
    root = str(tmp_path / "data")
    _write_unaligned(root)
    cfg = Config(data=DataConfig(dataroot=root, dataset_mode="unaligned",
                                 preprocess="none", batch_size=2,
                                 load_size=40, direction="BtoA",
                                 serial_batches=True))
    loader = DataLoader(cfg)
    b0 = next(iter(loader.epoch()))
    assert int(b0["a"][0, 0, 0, 0]) >= 100  # A side now serves B frames
    assert int(b0["b"][0, 0, 0, 0]) < 100


def test_unpaired_transform_independent_crops():
    """unpaired=True gives each side its own crop offset/flip; the
    default keeps them identical (regression guard for the paired
    path)."""
    from ir2rgb_tpu.data import preprocess_pair_batch
    # a == b: any difference after transform proves independent params
    ramp = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48, 1) % 251
    img = np.broadcast_to(ramp, (48, 48, 3))
    batch_img = np.stack([img] * 4).astype(np.uint8)
    a = jnp.asarray(batch_img)
    key = jax.random.PRNGKey(0)
    paired = preprocess_pair_batch(a, a, key, crop_size=32)
    np.testing.assert_array_equal(np.asarray(paired["a"]),
                                  np.asarray(paired["b"]))
    unpaired = preprocess_pair_batch(a, a, key, crop_size=32,
                                     unpaired=True)
    assert not np.array_equal(np.asarray(unpaired["a"]),
                              np.asarray(unpaired["b"]))


def test_cycle_cli_e2e(tmp_path):
    """train.py on an unaligned dataset, then test.py serving G_A."""
    import subprocess
    import sys
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    root = str(tmp_path / "data")
    _write_unaligned(root, na=4, nb=3)
    # test phase folders for the infer pass (aligned naming: testA only
    # + single mode keeps it simple)
    ckpts = str(tmp_path / "ckpts")
    out = subprocess.run(
        [sys.executable, "train.py", "--preset", "cyclegan_256",
         "--model.net_g", "resnet_6blocks",
         "--model.ngf", "4", "--model.ndf", "4",
         "--loss.pool_size", "4",
         "--data.dataroot", root, "--data.load_size", "40",
         "--data.crop_size", "32", "--data.batch_size", "2",
         "--train.name", "cyc", "--train.checkpoints_dir", ckpts,
         "--train.num_devices", "1",  # conftest exports 8 virtual devs
         "--train.niter", "1", "--train.niter_decay", "0",
         "--train.print_freq", "1"],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Cyc_A" in (out.stdout + out.stderr)
    results = str(tmp_path / "results")
    out2 = subprocess.run(
        [sys.executable, "test.py", "--preset", "cyclegan_256",
         "--model.net_g", "resnet_6blocks",
         "--model.ngf", "4", "--model.ndf", "4",
         "--data.dataset_mode", "single",
         "--data.dataroot", os.path.join(root, "trainA"),
         "--data.load_size", "40", "--data.crop_size", "32",
         "--train.name", "cyc", "--train.checkpoints_dir", ckpts,
         "--infer.results_dir", results],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=900)
    assert out2.returncode == 0, out2.stderr[-3000:]
    gallery = os.path.join(results, "cyc", "test_latest")
    assert os.path.isdir(gallery)
    pngs = [f for _, _, fs in os.walk(gallery) for f in fs
            if f.endswith(".png")]
    assert pngs
    # the reference cycle test driver's rec column: G_B(G_A(a))
    assert any("reconstructed" in f for f in pngs), pngs
