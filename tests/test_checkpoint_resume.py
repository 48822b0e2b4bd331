"""Checkpoint/resume round-trip (SURVEY.md §5): save the full TrainState
(params, optimizer, step, RNG, pool), restore, continue identically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.checkpoint import CheckpointManager
from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.data.synthetic import synthetic_pair_batch
from ir2rgb_tpu.train import create_model


def _setup():
    cfg = Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=4, ndf=4),
        data=DataConfig(crop_size=32, batch_size=1),
        loss=LossConfig(no_vgg_loss=True, pool_size=4),
        train=TrainConfig(),
    )
    model = create_model(cfg, steps_per_epoch=10)
    host = synthetic_pair_batch(1, 32)
    batch = {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
             "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}
    return model, batch


def test_save_restore_resume_identical(tmp_path):
    model, batch = _setup()
    state = model.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(model.train_step)

    state, _ = step(state, batch)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(2, jax.device_get(state), force=True)
    mgr.wait()

    # continue directly
    cont, m_direct = step(state, batch)

    # restore and continue
    restored = mgr.restore(2, template=jax.device_get(state))
    assert int(np.asarray(restored.step)) == 2
    res, m_restored = step(jax.device_put(restored), batch)

    for k in m_direct:
        assert float(m_direct[k]) == pytest.approx(float(m_restored[k]),
                                                   rel=1e-6), k
    for a, b in zip(jax.tree.leaves(jax.device_get(cont.g_params)),
                    jax.tree.leaves(jax.device_get(res.g_params))):
        np.testing.assert_array_equal(a, b)


def test_latest_step_and_retention(tmp_path):
    model, batch = _setup()
    state = jax.device_get(model.init_state(jax.random.PRNGKey(0), batch))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                            async_save=False)
    for s in (1, 2, 3):
        mgr.save(s, state, force=True)
    mgr.wait()
    assert mgr.latest_step() == 3
    assert len(list(mgr.all_steps())) <= 2  # retention enforced


def test_epoch_labeled_steps_survive_retention(tmp_path):
    """max_to_keep GC must not delete epoch-labeled steps: the reference
    keeps every <epoch>_net_G.pth, and epochs.json labels must stay
    restorable (round-3 review: dangling labels after retention)."""
    model, batch = _setup()
    state = jax.device_get(model.init_state(jax.random.PRNGKey(0), batch))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                            async_save=False)
    mgr.save(10, state, force=True)
    mgr.record_epoch(1, 10)  # epoch 1 ends at step 10
    for s in (20, 30, 40, 50):
        mgr.save(s, state, force=True)
    mgr.wait()
    steps = set(mgr.all_steps())
    assert 10 in steps, f"labeled step GC'd; kept {sorted(steps)}"
    assert mgr.step_for_label("1") == 10
    restored = mgr.restore(10, template=state)
    assert int(jax.device_get(restored.step)) == int(state.step)
    mgr.close()


def test_ema_state_checkpoint_roundtrip(tmp_path):
    """EMA weights persist through save/restore; and a checkpoint written
    WITHOUT EMA (ema_g=None — the pre-EMA state layout) restores against a
    None-EMA template unchanged (old runs stay resumable)."""
    import dataclasses
    cfg = Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=4, ndf=4),
        data=DataConfig(crop_size=32, batch_size=1),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(ema_decay=0.9),
    )
    model = create_model(cfg, steps_per_epoch=10)
    host = synthetic_pair_batch(1, 32)
    batch = {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
             "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(model.train_step)(state, batch)
    assert state.ema_g is not None

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(1, jax.device_get(state), force=True)
    mgr.wait()
    restored = mgr.restore(1, template=jax.device_get(state))
    for e, r in zip(jax.tree.leaves(state.ema_g),
                    jax.tree.leaves(restored.ema_g)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(r))
    # raw (template-free) restore exposes ema_g for the infer CLI
    raw = mgr.restore(1)
    assert "ema_g" in raw and raw["ema_g"] is not None

    # --- old-layout compatibility: ema off -> ema_g is None end-to-end
    cfg_off = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    ema_decay=0.0))
    model_off = create_model(cfg_off, steps_per_epoch=10)
    state_off = model_off.init_state(jax.random.PRNGKey(0), batch)
    assert state_off.ema_g is None
    mgr2 = CheckpointManager(str(tmp_path / "ckpt_off"), async_save=False)
    mgr2.save(1, jax.device_get(state_off), force=True)
    mgr2.wait()
    restored_off = mgr2.restore(1, template=jax.device_get(state_off))
    assert restored_off.ema_g is None
