"""Coverage for secondary model variants: resize_conv upsampling, bf16
numerics vs f32, dropout path, hinge GAN mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.infer.metrics import psnr
from ir2rgb_tpu.nn import GenConfig, define_g
from ir2rgb_tpu.nn.generators import resnet_generator_apply, resnet_generator_init


def test_resize_conv_upsample_forward_and_grad():
    """The checkerboard-free resize+conv upsampling variant."""
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8, upsample="resize_conv")
    params = resnet_generator_init(jax.random.PRNGKey(0), cfg, n_blocks=2)
    x = jnp.zeros((1, 32, 32, 3))
    y = resnet_generator_apply(params, x, cfg, n_blocks=2)
    assert y.shape == (1, 32, 32, 3)

    def loss(p):
        return jnp.mean(resnet_generator_apply(p, x, cfg, n_blocks=2) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_bf16_matches_f32_to_reasonable_psnr():
    """bf16 inference output should agree with f32 well beyond visual
    difference (the serving dtype policy)."""
    cfg32 = GenConfig(net_g="resnet_6blocks", ngf=8)
    params = resnet_generator_init(jax.random.PRNGKey(1), cfg32, n_blocks=2)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    y32 = resnet_generator_apply(params, x, cfg32, n_blocks=2)
    cfg16 = dataclasses.replace(cfg32, compute_dtype=jnp.bfloat16)
    y16 = resnet_generator_apply(params, x, cfg16, n_blocks=2)
    assert float(psnr(y16.astype(jnp.float32), y32)) > 30.0


def test_dropout_train_vs_eval():
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8, use_dropout=True)
    params = resnet_generator_init(jax.random.PRNGKey(2), cfg, n_blocks=2)
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    y_eval = resnet_generator_apply(params, x, cfg, n_blocks=2, train=False)
    y_tr1 = resnet_generator_apply(params, x, cfg, n_blocks=2, train=True,
                                   rng=jax.random.PRNGKey(10))
    y_tr2 = resnet_generator_apply(params, x, cfg, n_blocks=2, train=True,
                                   rng=jax.random.PRNGKey(11))
    # dropout active in train (different keys -> different outputs),
    # absent at eval (deterministic)
    assert np.abs(np.asarray(y_tr1) - np.asarray(y_tr2)).max() > 0
    y_eval2 = resnet_generator_apply(params, x, cfg, n_blocks=2, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))


def test_hinge_gan_mode_trains():
    from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
    from ir2rgb_tpu.data.synthetic import synthetic_pair_batch
    from ir2rgb_tpu.train import create_model
    cfg = Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=4, ndf=4),
        data=DataConfig(crop_size=32, batch_size=1),
        loss=LossConfig(gan_mode="hinge", no_vgg_loss=True),
        train=TrainConfig(),
    )
    model = create_model(cfg, steps_per_epoch=10)
    host = synthetic_pair_batch(1, 32)
    batch = {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
             "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    assert np.isfinite(float(metrics["D_real"]))


def test_remat_matches_plain():
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8)
    params = resnet_generator_init(jax.random.PRNGKey(3), cfg, n_blocks=2)
    x = jnp.asarray(np.random.RandomState(2)
                    .rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    y = resnet_generator_apply(params, x, cfg, n_blocks=2)
    cfg_r = dataclasses.replace(cfg, remat=True)
    y_r = resnet_generator_apply(params, x, cfg_r, n_blocks=2)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y), atol=1e-6)

    def loss(p, c):
        return jnp.mean(resnet_generator_apply(p, x, c, n_blocks=2) ** 2)

    g = jax.grad(lambda p: loss(p, cfg))(params)
    g_r = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)