"""Trainer integration on the 8-virtual-device CPU mesh: fit a few steps
through the real Trainer (sharded jit, checkpointing, logging, display
hook), then resume via continue_train (SURVEY.md §4.3-4.4, §5)."""

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
from ir2rgb_tpu.data.synthetic import synthetic_pair_batch
from ir2rgb_tpu.obs import Visualizer
from ir2rgb_tpu.train import Trainer, create_model


def _cfg(tmp_path, **train_kw):
    defaults = dict(name="trainer_it", checkpoints_dir=str(tmp_path),
                    niter=1, niter_decay=0, print_freq=2, display_freq=4,
                    save_latest_freq=100)
    defaults.update(train_kw)
    return Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=4, ndf=4),
        data=DataConfig(crop_size=32, batch_size=8),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(**defaults),
    )


def _batches(n):
    host = synthetic_pair_batch(8, 32)
    batch = {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
             "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}
    for _ in range(n):
        yield batch


def test_trainer_fit_and_resume(tmp_path):
    cfg = _cfg(tmp_path)
    model = create_model(cfg, steps_per_epoch=3)
    vis = Visualizer(cfg.run_dir(), cfg.train.name)
    trainer = Trainer(model, cfg, visualizer=vis)
    assert trainer.mesh.devices.size == 8

    first = next(_batches(1))
    state = trainer.init_or_restore(jax.random.PRNGKey(0), first)
    state = trainer.fit(state, _batches(10))  # niter*spe = 3 steps
    assert int(jax.device_get(state.step)) == 3

    # artifacts: config dump, loss log, structured metrics, final ckpt
    run = cfg.run_dir()
    assert os.path.exists(os.path.join(run, "config.json"))
    log = open(os.path.join(run, "loss_log.txt")).read()
    assert "G_GAN" in log
    assert os.path.exists(os.path.join(run, "metrics.jsonl"))
    assert trainer.ckpt.latest_step() == 3
    trainer.ckpt.close()

    # resume: continue_train picks up step 3 and continues to 6
    cfg2 = _cfg(tmp_path, continue_train=True, niter=2)
    model2 = create_model(cfg2, steps_per_epoch=3)
    trainer2 = Trainer(model2, cfg2, visualizer=vis)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(1), first)
    assert int(jax.device_get(state2.step)) == 3
    state2 = trainer2.fit(state2, _batches(10))
    assert int(jax.device_get(state2.step)) == 6
    trainer2.ckpt.close()


def test_trainer_load_pretrain(tmp_path):
    cfg = _cfg(tmp_path / "src")
    model = create_model(cfg, steps_per_epoch=2)
    trainer = Trainer(model, cfg)
    first = next(_batches(1))
    state = trainer.init_or_restore(jax.random.PRNGKey(0), first)
    state = trainer.fit(state, _batches(4))
    trainer.ckpt.close()

    cfg2 = _cfg(tmp_path / "dst", load_pretrain=cfg.run_dir())
    model2 = create_model(cfg2, steps_per_epoch=2)
    trainer2 = Trainer(model2, cfg2)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(7), first)
    # warm-started params, fresh step counter
    assert int(jax.device_get(state2.step)) == 0
    for a, b in zip(jax.tree.leaves(jax.device_get(state.g_params)),
                    jax.tree.leaves(jax.device_get(state2.g_params))):
        np.testing.assert_array_equal(a, b)
    trainer2.ckpt.close()


def test_which_epoch_resume_and_fresh_run_overwrite(tmp_path):
    """Reference --which_epoch parity (round-1 verdict item #7): train 3
    epochs with per-epoch saves, resume from the NON-latest epoch 2, and
    check the restored step. Also: a fresh (non-continue) run into the
    same dir must clear old steps instead of crashing on collision."""
    cfg = _cfg(tmp_path, niter=3, save_epoch_freq=1, save_latest_freq=100)
    model = create_model(cfg, steps_per_epoch=2)
    trainer = Trainer(model, cfg)
    state = trainer.init_or_restore(jax.random.PRNGKey(0),
                                    next(iter(_batches(1))))
    state = trainer.fit(state, _batches(10))
    assert int(jax.device_get(state.step)) == 6
    assert sorted(trainer.ckpt.all_steps()) == [2, 4, 6]
    assert trainer.ckpt.step_for_label("2") == 4
    assert trainer.ckpt.step_for_label("latest") == 6
    with pytest.raises(FileNotFoundError):
        trainer.ckpt.step_for_label("9")

    # resume from the named (non-latest) epoch 2
    cfg2 = _cfg(tmp_path, niter=3, save_epoch_freq=1,
                continue_train=True, which_epoch="2")
    model2 = create_model(cfg2, steps_per_epoch=2)
    trainer2 = Trainer(model2, cfg2)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(1),
                                      next(iter(_batches(1))))
    assert int(jax.device_get(state2.step)) == 4
    # the fork dropped the stale later checkpoint — and TRAINING PAST
    # the old step 6 must re-save it without StepAlreadyExistsError
    assert sorted(trainer2.ckpt.all_steps()) == [2, 4]
    state2 = trainer2.fit(state2, _batches(10))
    assert int(jax.device_get(state2.step)) == 6
    assert sorted(trainer2.ckpt.all_steps()) == [2, 4, 6]

    # fresh run, same dir: old steps cleared, no StepAlreadyExistsError
    cfg3 = _cfg(tmp_path, niter=1, save_epoch_freq=1)
    model3 = create_model(cfg3, steps_per_epoch=2)
    trainer3 = Trainer(model3, cfg3)
    assert trainer3.ckpt.latest_step() is None
    state3 = trainer3.init_or_restore(jax.random.PRNGKey(2),
                                      next(iter(_batches(1))))
    state3 = trainer3.fit(state3, _batches(5))
    assert int(jax.device_get(state3.step)) == 2
    assert sorted(trainer3.ckpt.all_steps()) == [2]


def test_restore_tolerates_f32_pool_checkpoint(tmp_path):
    """Pre-round-2 checkpoints hold an f32 image pool; the live template
    is compute-dtype (bf16). Resume must cast, not crash (advisor
    round-2 low #2)."""
    def cfg_bf16(**kw):
        c = _cfg(tmp_path, **kw)
        import dataclasses
        return dataclasses.replace(
            c, model=dataclasses.replace(c.model, compute_dtype="bf16"))

    cfg = cfg_bf16()
    model = create_model(cfg, steps_per_epoch=3)
    trainer = Trainer(model, cfg)
    first = next(_batches(1))
    state = trainer.init_or_restore(jax.random.PRNGKey(0), first)
    assert state.pool.buffer.dtype == jnp.bfloat16
    # simulate an old checkpoint: pool buffer saved as f32 (step value 1
    # so the restore is observable)
    old = state._replace(
        step=jnp.ones((), jnp.int32),
        pool=state.pool._replace(
            buffer=state.pool.buffer.astype(jnp.float32)))
    trainer.ckpt.save(1, jax.device_get(old), force=True)
    trainer.ckpt.wait()
    trainer.ckpt.close()

    cfg2 = cfg_bf16(continue_train=True)
    model2 = create_model(cfg2, steps_per_epoch=3)
    trainer2 = Trainer(model2, cfg2)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(1), first)
    assert int(jax.device_get(state2.step)) == 1
    assert state2.pool.buffer.dtype == jnp.bfloat16  # cast back on restore
    # training continues from the restored state
    state2, _ = trainer2._train_step(state2, trainer2.shard(first))
    assert int(jax.device_get(state2.step)) == 2
    trainer2.ckpt.close()


def test_display_uses_conditioning(tmp_path):
    """display_freq images from a feat/edges model are generated with
    the real conditioning, not the zeros prior (and differ from it)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.train import create_model
    from ir2rgb_tpu.train.trainer import Trainer

    cfg = PRESETS["pix2pixhd_512"]
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, ngf=4, ndf=4, n_downsample_global=2,
            n_blocks_global=1, n_blocks_local=1,
            use_instance_feat=True, nef=4, n_downsample_e=2,
            use_instance_edges=True),
        loss=dataclasses.replace(cfg.loss, no_vgg_loss=True),
        train=dataclasses.replace(cfg.train, name="dispcond",
                                  checkpoints_dir=str(tmp_path)))
    model = create_model(cfg, steps_per_epoch=10)
    trainer = Trainer(model, cfg, visualizer=None)
    rng = np.random.RandomState(0)
    batch = {
        "a": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
        "b": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
        "inst": jnp.asarray(rng.randint(0, 5, (1, 32, 32))),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch)
    y_cond = np.asarray(trainer._jit_generate_cond(
        state.g_params, batch["a"], batch["b"], batch["inst"]))
    y_zero = np.asarray(trainer._jit_generate(state.g_params, batch["a"]))
    assert y_cond.shape == y_zero.shape == (1, 32, 32, 3)
    assert not np.allclose(y_cond, y_zero)


def test_load_pretrain_global_into_local(tmp_path):
    """The pix2pixHD coarse-to-fine warm start: pretrain a GLOBAL G, then
    start a LOCAL (enhancer) run with --load_pretrain — the global trunk
    grafts in, enhancer branches keep their fresh init (reference
    load_network partial tolerance)."""
    import dataclasses

    cfg = _cfg(tmp_path / "src512")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, model="pix2pixhd", net_g="global", ngf=8,
        n_downsample_global=2, n_blocks_global=1))
    model = create_model(cfg, steps_per_epoch=2)
    trainer = Trainer(model, cfg)
    first = next(_batches(1))
    state = trainer.init_or_restore(jax.random.PRNGKey(0), first)
    state = trainer.fit(state, _batches(3))
    trainer.ckpt.close()

    cfg2 = _cfg(tmp_path / "dst1024", load_pretrain=cfg.run_dir(),
                niter_fix_global=1)
    cfg2 = cfg2.replace(model=dataclasses.replace(
        cfg2.model, model="pix2pixhd", net_g="local", ngf=4,
        n_downsample_global=2, n_blocks_global=1, n_blocks_local=1))
    model2 = create_model(cfg2, steps_per_epoch=2)
    trainer2 = Trainer(model2, cfg2)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(7), first)
    g2 = jax.device_get(state2.g_params)
    g1 = jax.device_get(state.g_params)
    # the local G's trunk took the pretrained global weights wherever
    # paths+shapes line up (the trunk head conv, at least)
    np.testing.assert_array_equal(g2["global"]["head"]["conv"]["w"],
                                  g1["head"]["conv"]["w"])
    # enhancer branch stays fresh-initialized (exists, not from src)
    assert "enhancer1" in g2
    trainer2.ckpt.close()


def test_completed_run_relaunch_is_noop(tmp_path):
    """Re-running a finished training command with --continue_train must
    exit cleanly without re-saving an existing step (orbax rejects
    duplicate steps)."""
    cfg = _cfg(tmp_path, niter=1)  # 1 epoch * 2 steps/epoch
    model = create_model(cfg, steps_per_epoch=2)
    trainer = Trainer(model, cfg)
    first = next(_batches(1))
    state = trainer.init_or_restore(jax.random.PRNGKey(0), first)
    state = trainer.fit(state, _batches(5))
    assert int(jax.device_get(state.step)) == 2
    trainer.ckpt.close()

    cfg2 = _cfg(tmp_path, niter=1, continue_train=True)
    model2 = create_model(cfg2, steps_per_epoch=2)
    trainer2 = Trainer(model2, cfg2)
    state2 = trainer2.init_or_restore(jax.random.PRNGKey(0), first)
    # already complete: fit must no-op (no StepAlreadyExists crash)
    state2 = trainer2.fit(state2, _batches(3))
    assert int(jax.device_get(state2.step)) == 2
    trainer2.ckpt.close()
