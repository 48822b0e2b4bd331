"""The persistent-s2d generator path must match the plain path exactly
(it is a pure representation change)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir2rgb_tpu.nn import GenConfig, define_g
from ir2rgb_tpu.nn.generators import (
    _gen_use_s2d,
    local_enhancer_apply,
    resnet_generator_apply,
)


def _x(h, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(1, h, h, c).astype(np.float32) * 2 - 1)


def test_resnet_s2d_matches_plain():
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8)
    params = resnet_generator_init_small(cfg)
    x = _x(256)
    assert _gen_use_s2d(cfg, x)
    y_s2d = resnet_generator_apply(params, x, cfg, n_blocks=2)
    cfg_plain = dataclasses.replace(cfg, norm="instance")
    # force plain path by shrinking input below the s2d threshold? No —
    # compare against a manually-disabled path instead:
    from ir2rgb_tpu.nn import generators
    orig = generators._S2D_MIN_RES
    try:
        generators._S2D_MIN_RES = 10 ** 9
        y_plain = resnet_generator_apply(params, x, cfg, n_blocks=2)
    finally:
        generators._S2D_MIN_RES = orig
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               atol=2e-5)


def resnet_generator_init_small(cfg):
    from ir2rgb_tpu.nn.generators import resnet_generator_init
    return resnet_generator_init(jax.random.PRNGKey(0), cfg, n_blocks=2)


def test_local_enhancer_s2d_matches_plain():
    cfg = GenConfig(net_g="local", ngf=8, n_downsample_global=2,
                    n_blocks_global=2, n_blocks_local=1,
                    n_local_enhancers=1)
    from ir2rgb_tpu.nn.generators import local_enhancer_init
    params = local_enhancer_init(jax.random.PRNGKey(1), cfg)
    x = _x(256, seed=2)
    y_s2d = local_enhancer_apply(params, x, cfg)
    from ir2rgb_tpu.nn import generators
    orig = generators._S2D_MIN_RES
    try:
        generators._S2D_MIN_RES = 10 ** 9
        y_plain = local_enhancer_apply(params, x, cfg)
    finally:
        generators._S2D_MIN_RES = orig
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               atol=2e-5)


def test_s2d_path_gradients_flow():
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8)
    params = resnet_generator_init_small(cfg)
    x = _x(256, seed=3)

    def loss(p):
        return jnp.mean(resnet_generator_apply(p, x, cfg, n_blocks=2) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_local_enhancer_fold4_wiring_matches_plain(monkeypatch):
    """Force the >=1024px fold-4 gates (head / down1 / tail) on a small
    frame via IR2RGB_HEAD/TAIL=fold4 + a faked tpu backend: the whole
    fold-4 enhancer wiring (head_fold4_reflect -> conv_fold4_to_s2d ->
    ... -> tail_from_fold4) must match the plain path."""
    cfg = GenConfig(net_g="local", ngf=8, n_downsample_global=2,
                    n_blocks_global=2, n_blocks_local=1,
                    n_local_enhancers=1)
    from ir2rgb_tpu.nn.generators import local_enhancer_init
    params = local_enhancer_init(jax.random.PRNGKey(1), cfg)
    x = _x(256, seed=2)
    from ir2rgb_tpu.nn import generators
    orig = generators._S2D_MIN_RES
    try:
        generators._S2D_MIN_RES = 10 ** 9
        y_plain = local_enhancer_apply(params, x, cfg)
    finally:
        generators._S2D_MIN_RES = orig
    monkeypatch.setenv("IR2RGB_HEAD", "fold4")
    monkeypatch.setenv("IR2RGB_TAIL", "fold4")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    y_f4 = local_enhancer_apply(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y_f4), np.asarray(y_plain),
                               atol=2e-5)


def test_resnet_s2d_nonsquare_matches_plain():
    """Non-square frames through the full s2d generator path (head,
    res blocks, down/up, tail) must match the plain path — every
    lowering's geometry is per-dim."""
    cfg = GenConfig(net_g="resnet_6blocks", ngf=8)
    params = resnet_generator_init_small(cfg)
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.rand(1, 256, 320, 3).astype(np.float32) * 2 - 1)
    assert _gen_use_s2d(cfg, x)
    y_s2d = resnet_generator_apply(params, x, cfg, n_blocks=2)
    assert y_s2d.shape == (1, 256, 320, 3)
    from ir2rgb_tpu.nn import generators
    orig = generators._S2D_MIN_RES
    try:
        generators._S2D_MIN_RES = 10 ** 9
        y_plain = resnet_generator_apply(params, x, cfg, n_blocks=2)
    finally:
        generators._S2D_MIN_RES = orig
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               atol=2e-5)


def test_local_enhancer_s2d_nonsquare_matches_plain():
    cfg = GenConfig(net_g="local", ngf=8, n_downsample_global=2,
                    n_blocks_global=2, n_blocks_local=1,
                    n_local_enhancers=1)
    from ir2rgb_tpu.nn.generators import local_enhancer_init
    params = local_enhancer_init(jax.random.PRNGKey(4), cfg)
    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.rand(1, 256, 320, 3).astype(np.float32) * 2 - 1)
    y_s2d = local_enhancer_apply(params, x, cfg)
    assert y_s2d.shape == (1, 256, 320, 3)
    from ir2rgb_tpu.nn import generators
    orig = generators._S2D_MIN_RES
    try:
        generators._S2D_MIN_RES = 10 ** 9
        y_plain = local_enhancer_apply(params, x, cfg)
    finally:
        generators._S2D_MIN_RES = orig
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               atol=2e-5)
