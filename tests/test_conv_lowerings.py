"""Exactness of the TPU conv lowerings (SURVEY.md §7 perf pass):

- space-to-depth conv (ir2rgb_tpu/nn/s2d_conv.py) vs direct conv;
- subpixel transposed conv (ops.deconv_apply) vs lhs-dilated form.

Both are exact rearrangements — element-wise equality, not tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from ir2rgb_tpu.nn import ops
from ir2rgb_tpu.nn.s2d_conv import conv_s2d, depth_to_space, space_to_depth


@pytest.mark.parametrize("k,pad,stride,h,ci,co", [
    (7, 0, 1, 70, 3, 8),     # c7s1 head after manual reflect pad
    (7, 3, 1, 64, 3, 8),     # c7s1 with folded symmetric pad
    (3, 0, 1, 66, 8, 8),     # res-block conv after manual pad
    (3, 1, 2, 64, 8, 16),    # stride-2 downsampler
    (4, 2, 2, 64, 6, 8),     # patchgan 4x4 stride 2, pad 2
    (4, 2, 1, 33, 8, 1),     # patchgan stride-1 tail, odd input
    (7, 0, 1, 518, 3, 4),    # full-size head shape (odd padded input)
])
def test_s2d_conv_exact(k, pad, stride, h, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-3, 4, (1, h, h, ci)).astype(np.float32))
    w = jnp.asarray(rng.randint(-3, 4, (k, k, ci, co)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    got = conv_s2d(x, w, stride, pad)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_s2d_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x), 3)), np.asarray(x))


@pytest.mark.parametrize("k,pad,op", [(3, 1, 1), (4, 1, 0)])
def test_subpixel_deconv_matches_dilated(k, pad, op):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randint(-3, 4, (1, 8, 8, 5)).astype(np.float32))
    p = {"w": jnp.asarray(rng.randint(-3, 4, (k, k, 5, 7))
                          .astype(np.float32))}
    ref = ops.deconv_apply(p, x, stride=2, k=k, pad=pad, output_padding=op,
                           lowering="dilated")
    got = ops.deconv_apply(p, x, stride=2, k=k, pad=pad, output_padding=op,
                           lowering="subpixel")
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv_apply_routes_small_channels_through_s2d():
    """Policy check: big spatial + few channels takes the s2d path and
    still matches the direct path."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.randn(16).astype(np.float32))}
    assert ops._use_s2d(x, p["w"], 1, 3)
    y = ops.conv_apply(p, x, stride=1, padding=3)
    ref = lax.conv_general_dilated(
        x, p["w"], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST) + p["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k,pad,h,ci,co", [
    (7, 0, 38, 3, 16),   # c7s1 head on a reflect-padded input
    (7, 3, 32, 3, 8),    # zero-pad form
    (3, 1, 20, 3, 12),   # VGG-entry shape
    (5, 2, 24, 6, 4),    # temporal 6-channel head
])
def test_head_im2col_exact_and_grads(k, pad, h, ci, co):
    """The im2col head lowering (round 3: one K-dense matmul instead of
    k*k channel-starved MXU passes) must match the direct fused
    image->s2d conv elementwise, and its custom VJP (backward via the
    direct form's linear transpose) must match direct-form gradients."""
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, h, h, ci), jnp.float32)
    w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
    hp = lax.Precision.HIGHEST

    out = s._conv_i2s_im2col_vjp(pad, hp, x, w)
    ref = s._conv_i2s_direct(x, w, 1, pad, hp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def f_new(x, w):
        return jnp.sum(jnp.sin(s._conv_i2s_im2col_vjp(pad, hp, x, w)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(s._conv_i2s_direct(x, w, 1, pad, hp)))

    g1 = jax.grad(f_new, argnums=(0, 1))(x, w)
    g2 = jax.grad(f_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,pad,stride,h,w_,ci,co", [
    (7, 0, 1, 70, 86, 3, 8),    # head after manual reflect pad
    (3, 1, 2, 64, 80, 8, 16),   # stride-2 downsampler
    (4, 2, 2, 36, 44, 6, 8),    # patchgan 4x4 s2 (512x640-style frame)
    (4, 2, 1, 33, 41, 8, 1),    # patchgan stride-1 tail, odd both dims
    (3, 0, 1, 34, 42, 8, 8),    # res-block conv after manual pad
    (3, 1, 2, 33, 40, 8, 8),    # odd H only (per-dim odd extension)
])
def test_s2d_conv_exact_nonsquare(k, pad, stride, h, w_, ci, co):
    """conv_s2d on H != W: every output extent, padding amount, and trim
    is per-dim (a discriminator on 512x640 frames must not silently
    drop the extra output columns)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(-3, 4, (1, h, w_, ci)).astype(np.float32))
    w = jnp.asarray(rng.randint(-3, 4, (k, k, ci, co)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    got = conv_s2d(x, w, stride, pad)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv_apply_s2d_gate_nonsquare():
    """The production gate admits non-square frames — the routed result
    must match the direct conv (width included)."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 128, 160, 6).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(4, 4, 6, 8).astype(np.float32) * 0.1)}
    assert ops._use_s2d(x, p["w"], 2, 2)
    y = ops.conv_apply(p, x, stride=2, padding=2)
    ref = lax.conv_general_dilated(
        x, p["w"], (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k,pad,op", [(3, 1, 1), (4, 1, 0), (3, 1, 0)])
def test_subpixel_deconv_nonsquare(k, pad, op):
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randint(-3, 4, (1, 8, 10, 5)).astype(np.float32))
    p = {"w": jnp.asarray(rng.randint(-3, 4, (k, k, 5, 7))
                          .astype(np.float32))}
    ref = ops.deconv_apply(p, x, stride=2, k=k, pad=pad, output_padding=op,
                           lowering="dilated")
    got = ops.deconv_apply(p, x, stride=2, k=k, pad=pad, output_padding=op,
                           lowering="subpixel")
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_deconv_output_padding_extends_beyond_2h():
    """k=4, pad=1, op=1 -> torch output 2h+1: the subpixel form can only
    trim, never extend, so this geometry must fall through to the
    dilated path and produce the full-size output (it used to silently
    return 2h — one row/col short of torch)."""
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randint(-3, 4, (1, 6, 9, 4)).astype(np.float32))
    p = {"w": jnp.asarray(rng.randint(-3, 4, (4, 4, 4, 5))
                          .astype(np.float32))}
    got = ops.deconv_apply(p, x, stride=2, k=4, pad=1, output_padding=1,
                           lowering="subpixel")
    assert got.shape == (1, 13, 19, 5)  # (h-1)*2 - 2 + 4 + 1
    ref = ops.deconv_apply(p, x, stride=2, k=4, pad=1, output_padding=1,
                           lowering="dilated")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_s2d_conv_randomized_geometry_sweep():
    """Randomized fuzz over (k, pad, stride, h, w, ci, co): 40 seeded
    geometries, integer-exact equality vs the direct conv — breadth
    beyond the curated cases above for the perf-critical lowering."""
    rng = np.random.RandomState(1234)
    tried = 0
    while tried < 40:
        k = int(rng.choice([1, 3, 4, 5, 7]))
        stride = int(rng.choice([1, 2]))
        pad = int(rng.randint(0, k))
        h = int(rng.randint(6, 40))
        w_ = int(rng.randint(6, 40))
        ci = int(rng.randint(1, 9))
        co = int(rng.randint(1, 9))
        # valid output geometry only
        if h + 2 * pad < k or w_ + 2 * pad < k:
            continue
        tried += 1
        x = jnp.asarray(rng.randint(-3, 4, (1, h, w_, ci))
                        .astype(np.float32))
        w = jnp.asarray(rng.randint(-3, 4, (k, k, ci, co))
                        .astype(np.float32))
        ref = lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)
        got = conv_s2d(x, w, stride, pad)
        assert got.shape == ref.shape, (k, pad, stride, h, w_, ci, co)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref),
            err_msg=f"k={k} pad={pad} s={stride} h={h} w={w_} "
                    f"ci={ci} co={co}")


def test_subpixel_deconv_randomized_sweep():
    """Randomized fuzz of the subpixel transposed-conv lowering vs the
    lhs-dilated reference form across (k, pad, op, h, w, ci, co)."""
    from ir2rgb_tpu.nn import ops

    rng = np.random.RandomState(4321)
    tried = 0
    while tried < 25:
        k = int(rng.choice([3, 4, 5]))
        pad = int(rng.randint(0, k))
        op = int(rng.randint(0, 2))
        h = int(rng.randint(5, 24))
        w_ = int(rng.randint(5, 24))
        ci = int(rng.randint(1, 7))
        co = int(rng.randint(1, 7))
        # torch ConvTranspose2d validity: output = 2(h-1) + k - 2p + op
        out_h = 2 * (h - 1) + k - 2 * pad + op
        out_w = 2 * (w_ - 1) + k - 2 * pad + op
        if out_h <= 0 or out_w <= 0 or op >= 2:
            continue
        tried += 1
        p = {"w": jnp.asarray(rng.randint(-3, 4, (k, k, ci, co))
                              .astype(np.float32)),
             "b": jnp.asarray(rng.randint(-2, 3, (co,))
                              .astype(np.float32))}
        x = jnp.asarray(rng.randint(-3, 4, (1, h, w_, ci))
                        .astype(np.float32))
        ref = ops.deconv_apply(p, x, stride=2, k=k, pad=pad,
                               output_padding=op, lowering="dilated")
        got = ops.deconv_apply(p, x, stride=2, k=k, pad=pad,
                               output_padding=op, lowering="subpixel")
        assert got.shape == ref.shape, (k, pad, op, h, w_, ci, co)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref),
            err_msg=f"k={k} pad={pad} op={op} h={h} w={w_}")
