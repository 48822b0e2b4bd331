"""Int8 quantized serving path (nn/quant.py): wrapper closeness on every
conv variant the framework lowers through, end-to-end generator PSNR,
bf16 composition, StreamingGenerator e2e, and the training refusal."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ir2rgb_tpu.infer.metrics import psnr
from ir2rgb_tpu.nn import GenConfig, define_g, quant


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    quant.set_mode("none")


def test_set_mode_validates():
    with pytest.raises(ValueError, match="quant mode"):
        quant.set_mode("fp4")
    quant.set_mode("int8")
    assert quant.mode() == "int8"
    quant.set_mode(None)
    assert quant.mode() == "none"


def _rel_err(a, b):
    return float(jnp.abs(a - b).max() / jnp.abs(b).max())


def test_int8_conv_variants_close():
    """The wrapper stays within dynamic-int8 error on every conv shape
    the generators use: plain, strided, lhs-dilated (subpixel deconv),
    and negative padding (the fold-4 head)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 8), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 8, 16) * 0.1, jnp.float32)
    cases = [
        dict(window_strides=(1, 1), padding="SAME"),
        dict(window_strides=(2, 2), padding=[(1, 1), (1, 1)]),
        dict(window_strides=(1, 1), padding=[(1, 1), (1, 1)],
             lhs_dilation=(2, 2)),
        dict(window_strides=(1, 1), padding=[(-1, 2), (-1, 2)]),
    ]
    for kw in cases:
        ref = lax.conv_general_dilated(
            x, w, dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
        quant.set_mode("none")
        passthrough = quant.conv(
            x, w, dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
        np.testing.assert_array_equal(np.asarray(passthrough),
                                      np.asarray(ref))
        quant.set_mode("int8")
        q = quant.conv(x, w, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                       **kw)
        assert q.dtype == ref.dtype
        assert _rel_err(q, ref) < 0.03, (kw, _rel_err(q, ref))
        quant.set_mode("none")


def test_int8_dot_close():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 4, 72), jnp.float32)
    w = jnp.asarray(rs.randn(72, 32) * 0.1, jnp.float32)
    dn = (((3,), (0,)), ((), ()))
    ref = lax.dot_general(x, w, dn)
    quant.set_mode("int8")
    q = quant.dot(x, w, dn)
    assert _rel_err(q, ref) < 0.03


def _gen_outputs(net, dtype, size=128):
    cfg = GenConfig(net_g=net, input_nc=3, output_nc=3, ngf=32,
                    norm="instance", upsample="deconv",
                    compute_dtype=dtype)
    g_init, g_apply = define_g(cfg)
    params = g_init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, size, size, 3) * 2
                    - 1, jnp.float32)
    quant.set_mode("none")
    ref = jax.jit(lambda p, x: g_apply(p, x, train=False))(params, x)
    quant.set_mode("int8")
    q = jax.jit(lambda p, x: g_apply(p, x, train=False))(params, x)
    quant.set_mode("none")
    return ref, q


def test_generator_int8_psnr_resnet9():
    """Whole-generator dynamic int8 stays >=30 dB of the fp32 output
    (36.4 dB measured on random weights; instance norm after each conv
    renormalizes away most per-layer scale error). Random-He weights are
    the HARSHER case — trained IN statistics are better conditioned."""
    ref, q = _gen_outputs("resnet_9blocks", jnp.float32)
    assert float(psnr(ref, q)) >= 30.0


def test_generator_int8_psnr_global():
    ref, q = _gen_outputs("global", jnp.float32)
    assert float(psnr(ref, q)) >= 27.0  # 31.6 measured


def test_generator_int8_bf16_composes():
    """int8 quantization on the bf16 serving path: output dtype follows
    the compute dtype and stays close to the fp32 reference."""
    ref32, _ = _gen_outputs("resnet_9blocks", jnp.float32)
    _, q16 = _gen_outputs("resnet_9blocks", jnp.bfloat16)
    assert q16.dtype == jnp.bfloat16
    assert float(psnr(ref32, q16.astype(jnp.float32))) >= 25.0


def test_streaming_generator_int8_e2e():
    """--infer.quant int8 end-to-end: the pipelined uint8 serving loop
    jits with the quantized convs and yields frames close to the fp
    loop's."""
    from ir2rgb_tpu.config import Config, ModelConfig
    from ir2rgb_tpu.infer.stream import StreamingGenerator
    from ir2rgb_tpu.train import create_model
    cfg = Config(model=ModelConfig(model="pix2pix",
                                   net_g="resnet_6blocks",
                                   net_d="n_layers", ngf=8, ndf=8))
    model = create_model(cfg, steps_per_epoch=1)
    batch = {"a": jnp.zeros((1, 64, 64, 3)), "b": jnp.zeros((1, 64, 64, 3))}
    g_params = model.init_state(jax.random.PRNGKey(0), batch).g_params
    frame = (np.random.RandomState(0).rand(64, 64, 3)
             * 255).astype(np.uint8)
    ref = StreamingGenerator(model, g_params, (64, 64)).push(frame)
    quant.set_mode("int8")
    out = StreamingGenerator(model, g_params, (64, 64)).push(frame)
    quant.set_mode("none")
    assert out.shape == ref.shape and out.dtype == np.uint8
    # uint8 galleries: int8 quantization shifts pixels only slightly
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert float(np.mean(diff)) < 4.0, float(np.mean(diff))


def test_train_cli_refuses_quant_mode():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env["IR2RGB_QUANT"] = "int8"
    out = subprocess.run(
        [sys.executable, "train.py", "--data.dataroot", "/nonexistent"],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=300)
    assert out.returncode != 0
    assert "serving-only" in (out.stdout + out.stderr)
