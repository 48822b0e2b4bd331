"""Shape/dtype unit tests for the model zoo (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import pytest

from ir2rgb_tpu.nn import (
    DiscConfig,
    GenConfig,
    define_d,
    define_g,
)


KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("net_g,size", [
    ("resnet_9blocks", 64),
    ("resnet_6blocks", 64),
    ("unet_256", 256),
    ("unet_128", 128),
])
def test_generator_shapes(net_g, size):
    cfg = GenConfig(net_g=net_g, ngf=8)
    init, apply = define_g(cfg)
    params = init(KEY)
    x = jnp.zeros((1, size, size, 3))
    y = apply(params, x)
    assert y.shape == (1, size, size, 3)
    assert y.dtype == jnp.float32
    # tanh range
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_global_generator_shapes():
    cfg = GenConfig(net_g="global", ngf=4, n_downsample_global=3,
                    n_blocks_global=2)
    init, apply = define_g(cfg)
    y = apply(init(KEY), jnp.zeros((1, 64, 64, 3)))
    assert y.shape == (1, 64, 64, 3)


def test_local_enhancer_shapes():
    cfg = GenConfig(net_g="local", ngf=4, n_downsample_global=2,
                    n_blocks_global=2, n_blocks_local=1, n_local_enhancers=1)
    init, apply = define_g(cfg)
    y = apply(init(KEY), jnp.zeros((1, 64, 64, 3)))
    assert y.shape == (1, 64, 64, 3)


def test_patchgan_shapes_and_receptive_field():
    cfg = DiscConfig(net_d="n_layers", input_nc=6, ndf=8, n_layers=3,
                     d_pad=1, get_interm_feat=True)
    init, apply = define_d(cfg)
    out = apply(init(KEY), jnp.zeros((2, 70, 70, 6)))
    assert len(out) == 1  # one scale
    feats = out[0]
    assert len(feats) == 5  # 4 taps + logits
    logits = feats[-1]
    # 70x70 receptive field: a 70px input yields a small logit map
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.dtype == jnp.float32


def test_multiscale_disc_structure():
    cfg = DiscConfig(net_d="multiscale", input_nc=6, ndf=8, n_layers=3,
                     num_d=3, get_interm_feat=True)
    init, apply = define_d(cfg)
    out = apply(init(KEY), jnp.zeros((1, 128, 128, 6)))
    assert len(out) == 3
    # scales shrink by 2x
    s0 = out[0][-1].shape[1]
    s1 = out[1][-1].shape[1]
    s2 = out[2][-1].shape[1]
    assert s0 > s1 > s2


def test_generator_jit_once():
    """The generator apply must be jittable (static config closure)."""
    cfg = GenConfig(net_g="resnet_6blocks", ngf=4)
    init, apply = define_g(cfg)
    params = init(KEY)
    jf = jax.jit(lambda p, x: apply(p, x))
    y = jf(params, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)


def test_bf16_compute_dtype():
    cfg = GenConfig(net_g="resnet_6blocks", ngf=4,
                    compute_dtype=jnp.bfloat16)
    init, apply = define_g(cfg)
    y = apply(init(KEY), jnp.zeros((1, 32, 32, 3)))
    assert y.dtype == jnp.bfloat16


def test_indivisible_input_raises_clear_error():
    """A 48px frame through net_g=local (1 enhancer + 4 global downs
    needs /32) must fail with the divisibility message, not an opaque
    broadcast error deep in the trunk (round-3 UX guard)."""
    cfg = GenConfig(net_g="local", ngf=4, n_local_enhancers=1,
                    n_downsample_global=4)
    init, apply = define_g(cfg)
    params = init(KEY)
    with pytest.raises(ValueError, match="divisible by 32"):
        apply(params, jnp.zeros((1, 48, 48, 3)))
    # resnet path: 30px with 2 downs needs /4
    cfg2 = GenConfig(net_g="resnet_6blocks", ngf=4)
    init2, apply2 = define_g(cfg2)
    with pytest.raises(ValueError, match="divisible by 4"):
        apply2(init2(KEY), jnp.zeros((1, 30, 30, 3)))
    # unet_128: 7 downs need /128
    cfg3 = GenConfig(net_g="unet_128", ngf=4)
    init3, apply3 = define_g(cfg3)
    with pytest.raises(ValueError, match="divisible by 128"):
        apply3(init3(KEY), jnp.zeros((1, 96, 96, 3)))
    # compatible sizes still pass
    assert apply(params, jnp.zeros((1, 64, 64, 3))).shape == (1, 64, 64, 3)
