"""Golden-value parity of core ops against torch CPU (SURVEY.md §4.1-4.2).

The parity bar for the whole framework is >=40 dB PSNR vs reference
outputs; these tests pin every primitive op far tighter than that so
end-to-end drift can only come from float accumulation order.
"""

import numpy as np
import pytest
import torch

# oneDNN's fastmath conv path drifts ~5e-3 from exact f32; force the
# reference implementation so tolerances can stay tight.
torch.backends.mkldnn.enabled = False

import jax
import jax.numpy as jnp

from ir2rgb_tpu.nn import ops


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _to_jax(x_torch_nchw):
    return jnp.asarray(x_torch_nchw.detach().numpy().transpose(0, 2, 3, 1))


@pytest.fixture
def x_t():
    torch.manual_seed(7)
    return torch.randn(2, 4, 16, 16)


def test_conv_parity(x_t):
    conv = torch.nn.Conv2d(4, 8, 3, stride=2, padding=1)
    y_t = conv(x_t).detach().numpy()
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    y_j = ops.conv_apply(p, _to_jax(x_t), stride=2, padding=1)
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=2e-5)


def test_conv7_reflect_pad_parity(x_t):
    conv = torch.nn.Conv2d(4, 8, 7)
    pad = torch.nn.ReflectionPad2d(3)
    y_t = conv(pad(x_t)).detach().numpy()
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    y_j = ops.conv_apply(p, ops.reflect_pad(_to_jax(x_t), 3))
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=2e-5)


@pytest.mark.parametrize("k,padding,output_padding", [(3, 1, 1), (4, 1, 0)])
def test_deconv_parity(x_t, k, padding, output_padding):
    """ConvTranspose2d == lhs-dilated conv with pre-flipped kernel.

    k=3,p=1,op=1 is the resnet/global upsampler; k=4,p=1 the U-Net's."""
    ct = torch.nn.ConvTranspose2d(4, 8, k, stride=2, padding=padding,
                                  output_padding=output_padding)
    y_t = ct(x_t).detach().numpy()
    w = ct.weight.detach().numpy()  # (in, out, kh, kw)
    # canonical storage: spatially flipped, HWIO
    p = {"w": jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)),
         "b": jnp.asarray(ct.bias.detach().numpy())}
    y_j = ops.deconv_apply(p, _to_jax(x_t), stride=2, k=k, pad=padding,
                           output_padding=output_padding)
    assert _nchw(y_j).shape == y_t.shape
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=5e-5)


def test_instance_norm_parity(x_t):
    y_t = torch.nn.InstanceNorm2d(4, affine=False)(x_t).numpy()
    y_j = ops.instance_norm(_to_jax(x_t))
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=1e-5)


def test_batch_norm_parity(x_t):
    bn = torch.nn.BatchNorm2d(4)
    bn.train()
    with torch.no_grad():
        bn.weight.copy_(torch.randn(4))
        bn.bias.copy_(torch.randn(4))
    y_t = bn(x_t).detach().numpy()
    p = {"gamma": jnp.asarray(bn.weight.detach().numpy()),
         "beta": jnp.asarray(bn.bias.detach().numpy())}
    y_j = ops.batch_norm(p, _to_jax(x_t))
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=1e-4)


def test_avg_pool_parity(x_t):
    y_t = torch.nn.AvgPool2d(3, stride=2, padding=1,
                             count_include_pad=False)(x_t).numpy()
    y_j = ops.avg_pool(_to_jax(x_t), 3, 2, 1)
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=1e-6)


def test_leaky_relu_parity(x_t):
    y_t = torch.nn.LeakyReLU(0.2)(x_t).numpy()
    y_j = ops.apply_act(_to_jax(x_t), "leaky_relu")
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=1e-6)


def test_resize_nearest_parity(x_t):
    y_t = torch.nn.Upsample(scale_factor=2, mode="nearest")(x_t).numpy()
    y_j = ops.resize_nearest(_to_jax(x_t), 2)
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=0)


def test_max_pool_parity(x_t):
    from ir2rgb_tpu.nn.vgg import _max_pool
    y_t = torch.nn.MaxPool2d(2, 2)(x_t).numpy()
    y_j = _max_pool(_to_jax(x_t))
    np.testing.assert_allclose(_nchw(y_j), y_t, atol=0)
