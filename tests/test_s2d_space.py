"""Exactness of persistent-s2d-space ops vs image-space ops."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from ir2rgb_tpu.nn import ops
from ir2rgb_tpu.nn.s2d_space import (
    conv_on_s2d,
    from_s2d,
    instance_norm_act_s2d,
    reflect_pad_s2d,
    to_s2d,
)


def _x(h, c, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(1, h, h, c).astype(np.float32))


@pytest.mark.parametrize("pad", [1, 2, 3])
@pytest.mark.parametrize("h,c", [(16, 4), (32, 3), (30, 8)])
def test_reflect_pad_s2d_exact(pad, h, c):
    x = _x(h, c)
    ref = ops.reflect_pad(x, pad)
    # odd padded size: only even-size outputs have an s2d rep
    if ref.shape[1] % 2:
        pytest.skip("odd padded size has no s2d rep")
    got = from_s2d(reflect_pad_s2d(to_s2d(x), pad), c)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("k,pad,stride,out_s2d", [
    (7, 0, 1, True),    # head conv after reflect pad
    (3, 0, 1, True),    # res-block conv after reflect pad
    (3, 1, 2, False),   # downsampler -> normal rep
    (3, 1, 2, True),    # downsampler -> s2d rep of half res
])
def test_conv_on_s2d_exact(k, pad, stride, out_s2d):
    rng = np.random.RandomState(1)
    ci, co = 4, 6
    h = 32 + (k - 1 if pad == 0 else 0)  # even output size
    x = jnp.asarray(rng.randint(-3, 4, (1, h, h, ci)).astype(np.float32))
    w = jnp.asarray(rng.randint(-3, 4, (k, k, ci, co)).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    got = conv_on_s2d(to_s2d(x), w, stride=stride, pad=pad, out_s2d=out_s2d)
    if out_s2d:
        got = from_s2d(got, co)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("act", ["none", "relu", "tanh"])
def test_instance_norm_act_s2d_exact(act):
    x = _x(16, 8, seed=3) * 2 + 1
    ref = ops.apply_act(ops.instance_norm(x), act)
    got = from_s2d(instance_norm_act_s2d(to_s2d(x), act), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_instance_norm_input_dtype_elementwise(monkeypatch):
    """IR2RGB_IN_ELT=input: stats stay fp32 but the normalize multiply
    runs in the input dtype (the batch-2..7 split-conv layout fix).
    bf16 output must agree with the fp32 path within bf16 rounding, and
    the fp32 path must be bit-identical to the default."""
    x = (_x(16, 8, seed=3) * 2 + 1)
    ref = from_s2d(instance_norm_act_s2d(to_s2d(x), "relu"), 8)
    monkeypatch.setenv("IR2RGB_IN_ELT", "input")
    # f32 input: flag is inert, identical math
    got32 = from_s2d(instance_norm_act_s2d(to_s2d(x), "relu"), 8)
    np.testing.assert_array_equal(np.asarray(got32), np.asarray(ref))
    # bf16 input: same values within bf16 rounding of O(1) activations
    xb = x.astype(jnp.bfloat16)
    got16 = from_s2d(instance_norm_act_s2d(to_s2d(xb), "relu"), 8)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got16, dtype=np.float32),
                               np.asarray(ref), atol=0.05)
    # ops.instance_norm honors the same flag
    refo = ops.instance_norm(x)
    goto16 = ops.instance_norm(xb)
    assert goto16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(goto16, dtype=np.float32),
                               np.asarray(refo), atol=0.05)


def test_deconv_to_s2d_matches_deconv():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32)),
         "b": jnp.asarray(rng.randn(4).astype(np.float32))}
    ref = ops.deconv_apply(p, x, stride=2, k=3, pad=1, output_padding=1)
    got = from_s2d(ops.deconv_apply_s2d_out(p, x, k=3, pad=1), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("mode", ["phase", "phase_dot"])
def test_up_apply_phase_matches_plain(mode):
    """The mid-stack phase-rep upsampler (generators._up_apply_phase:
    subpixel phase output -> phase-grouped IN+relu -> one interleave)
    equals deconv -> d2s -> IN+relu. Normalize and interleave commute
    elementwise, so the only differences are float reassociation in the
    stats reduction order."""
    from ir2rgb_tpu.nn.generators import (
        GenConfig,
        _up_apply,
        _up_apply_phase,
    )
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))
    p = {"up": {"w": jnp.asarray(rng.randn(3, 3, 12, 6)
                                 .astype(np.float32) * 0.2),
                "b": jnp.asarray(rng.randn(6).astype(np.float32))},
         "norm": {}}
    cfg = GenConfig(norm="instance", upsample="deconv",
                    compute_dtype=jnp.float32)
    ref = _up_apply(p, x, cfg)
    got = _up_apply_phase(p, x, cfg, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_chain_resblock_in_s2d():
    """A full residual block computed in s2d space equals the image-space
    one: pad1 + conv3 + IN + relu + pad1 + conv3 + IN + skip."""
    rng = np.random.RandomState(5)
    c = 4
    x = jnp.asarray(rng.randn(1, 16, 16, c).astype(np.float32))
    w0 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.2)

    h = ops.reflect_pad(x, 1)
    h = ops.conv_apply({"w": w0}, h)
    h = ops.apply_act(ops.instance_norm(h), "relu")
    h = ops.reflect_pad(h, 1)
    h = ops.conv_apply({"w": w1}, h)
    ref = x + ops.instance_norm(h)

    xs = to_s2d(x)
    hs = reflect_pad_s2d(xs, 1)
    hs = conv_on_s2d(hs, w0)
    hs = instance_norm_act_s2d(hs, "relu")
    hs = reflect_pad_s2d(hs, 1)
    hs = conv_on_s2d(hs, w1)
    got = from_s2d(xs + instance_norm_act_s2d(hs, "none"), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_deconv_s2d_to_s2d_exact():
    """Quad-phase deconv: s2d in -> s2d out, no plain-rep hop."""
    from ir2rgb_tpu.nn.s2d_space import deconv_s2d_to_s2d
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 16, 16, 6).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32)),
         "b": jnp.asarray(rng.randn(4).astype(np.float32))}
    ref = ops.deconv_apply(p, x, stride=2, k=3, pad=1, output_padding=1)
    got_s2d = deconv_s2d_to_s2d(to_s2d(x), p["w"], p["b"])
    got = from_s2d(got_s2d, 4)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_in_stats_dot_matches_reduce(dtype):
    """The MXU stats path (ones-matmul sum + Gram-diagonal square-sum,
    custom analytic VJP) must match the upcast-reduce formulation in
    values AND gradients."""
    from ir2rgb_tpu.nn.s2d_space import _in_stats_dot
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32)).astype(dtype)
    s, ss = _in_stats_dot(xs)
    x32 = xs.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(jnp.sum(x32, axis=(1, 2))),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ss),
                               np.asarray(jnp.sum(x32 * x32, axis=(1, 2))),
                               rtol=1e-5, atol=1e-4)

    ct_s = jnp.asarray(rng.randn(2, 24), jnp.float32)
    ct_ss = jnp.asarray(rng.randn(2, 24), jnp.float32)

    def f(v):
        a, b = _in_stats_dot(v)
        return jnp.sum(a * ct_s) + jnp.sum(b * ct_ss)

    def f_ref(v):
        v32 = v.astype(jnp.float32)
        return (jnp.sum(jnp.sum(v32, axis=(1, 2)) * ct_s)
                + jnp.sum(jnp.sum(v32 * v32, axis=(1, 2)) * ct_ss))

    g, g_ref = jax.grad(f)(xs), jax.grad(f_ref)(xs)
    np.testing.assert_array_equal(np.asarray(g.astype(jnp.float32)),
                                  np.asarray(g_ref.astype(jnp.float32)))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_conv_wide_custom_vjp_matches_direct(dtype):
    """conv_on_s2d_wide's "forward wide, backward direct" custom VJP:
    gradients must be bit-exact against autodiff of the direct
    conv_on_s2d formulation (they run the same transposed-conv ops)."""
    from ir2rgb_tpu.nn.s2d_space import conv_on_s2d, conv_on_s2d_wide
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.randn(7, 7, 8, 3).astype(np.float32) * .1).astype(dtype)
    ct = jnp.asarray(rng.randn(1, 16, 16, 12).astype(np.float32)).astype(dtype)
    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)

    def loss_w(a, b):
        return jnp.sum(conv_on_s2d_wide(a, b, 3, prec).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    def loss_d(a, b):
        return jnp.sum(
            conv_on_s2d(a, b, stride=1, pad=3,
                        precision=prec).astype(jnp.float32)
            * ct.astype(jnp.float32))

    gx_w, gw_w = jax.grad(loss_w, argnums=(0, 1))(xs, w)
    gx_d, gw_d = jax.grad(loss_d, argnums=(0, 1))(xs, w)
    np.testing.assert_array_equal(
        np.asarray(gx_w.astype(jnp.float32)),
        np.asarray(gx_d.astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(gw_w.astype(jnp.float32)),
        np.asarray(gw_d.astype(jnp.float32)))


def test_deconv_in_act_s2d_matches_post_d2s_norm():
    """IN+act on the pre-d2s 16-phase rep == IN+act after the d2s
    (stats are phase-invariant; round-3 lowering halves the d2s
    transpose traffic)."""
    from ir2rgb_tpu.nn.s2d_space import (
        deconv_in_act_s2d,
        deconv_s2d_to_s2d,
        instance_norm_act_s2d,
    )

    r = np.random.RandomState(0)
    xs = jnp.asarray(r.randn(2, 8, 8, 4 * 6), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 6, 5) * 0.2, jnp.float32)
    b = jnp.asarray(r.randn(5), jnp.float32)
    ref = instance_norm_act_s2d(deconv_s2d_to_s2d(xs, w, b), "relu")
    got = deconv_in_act_s2d(xs, w, b, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_deconv_in_act_s2d_post_knob_honors_emit_d2s(monkeypatch):
    """IR2RGB_DECONV_NORM=post must not leak the post-d2s rep to an
    emit_d2s=False caller (tail_from_fold4 needs the 16co-phase rep;
    the knob is only honored on the d2s-emitting path — review fix)."""
    from ir2rgb_tpu.nn.s2d_space import deconv_in_act_s2d

    r = np.random.RandomState(5)
    xs = jnp.asarray(r.randn(1, 8, 8, 4 * 6), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 6, 5) * 0.2, jnp.float32)
    b = jnp.asarray(r.randn(5), jnp.float32)
    ref_fold = deconv_in_act_s2d(xs, w, b, "relu", emit_d2s=False)
    ref_d2s = deconv_in_act_s2d(xs, w, b, "relu")
    monkeypatch.setenv("IR2RGB_DECONV_NORM", "post")
    got_fold = deconv_in_act_s2d(xs, w, b, "relu", emit_d2s=False)
    got_d2s = deconv_in_act_s2d(xs, w, b, "relu")
    assert got_fold.shape == ref_fold.shape  # pre-d2s (n,h,w,16co)
    np.testing.assert_allclose(np.asarray(got_fold), np.asarray(ref_fold),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d2s), np.asarray(ref_d2s),
                               atol=1e-5, rtol=1e-5)


def test_resnet_block_border_fixup_matches_materialized_pad(monkeypatch):
    """The high-res gate routing res-block pads through the border-fixup
    conv must be exact vs the materialized reflect pad (forced on small
    shapes by lowering the threshold)."""
    from ir2rgb_tpu.nn import generators as G

    cfg = G.GenConfig(ngf=8)
    key = jax.random.PRNGKey(0)
    p = G._resnet_block_init(key, 8, "instance", True)  # 8 image channels
    hs = jnp.asarray(np.random.RandomState(1).randn(1, 24, 24, 4 * 8),
                     jnp.float32)
    ref = G._resnet_block_apply_s2d(p, hs, cfg)
    monkeypatch.setattr(G, "_BORDER_FIXUP_MIN_ROWS", 4)
    got = G._resnet_block_apply_s2d(p, hs, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tail_from_fold4_matches_s2d_tail():
    """Final-level fusion (round 3): deconv pre-d2s rep -> fold-4 tail
    conv -> image must equal [deconv + d2s + reflect-conv tail + tanh +
    from_s2d] elementwise, including the reflect-corrected borders and
    corners."""
    from ir2rgb_tpu.nn.s2d_space import (
        conv_reflect_s2d,
        deconv_in_act_s2d,
        from_s2d,
        tail_from_fold4,
    )

    r = np.random.RandomState(3)
    for ci_in, co_up, hs, k in [(8, 6, 12, 7), (4, 5, 16, 7), (8, 6, 12, 3)]:
        xs = jnp.asarray(r.randn(1, hs, hs, 4 * ci_in) * 0.5, jnp.float32)
        wd = jnp.asarray(r.randn(3, 3, ci_in, co_up) * 0.2, jnp.float32)
        bd = jnp.asarray(r.randn(co_up), jnp.float32)
        wt = jnp.asarray(r.randn(k, k, co_up, 3) * 0.1, jnp.float32)
        bt = jnp.asarray(r.randn(3), jnp.float32)
        hs2 = deconv_in_act_s2d(xs, wd, bd, "relu")
        y = conv_reflect_s2d(hs2, wt) + jnp.tile(bt, 4)
        ref = from_s2d(jnp.tanh(y.astype(jnp.float32)), 3)
        y4 = deconv_in_act_s2d(xs, wd, bd, "relu", emit_d2s=False)
        got = tail_from_fold4(y4, wt, bt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_head_fold4_matches_direct_head():
    """fold-4 head conv + pre-d2s IN == direct fused head + IN (round-3
    lowering for >= 1024 px heads)."""
    from jax import lax

    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(4)
    for k, ci, co, out in [(7, 3, 16, 16), (7, 6, 8, 32), (3, 3, 8, 16)]:
        h = out + k - 1
        x = jnp.asarray(r.randn(1, h, h, ci), jnp.float32)
        w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
        b = jnp.asarray(r.randn(co), jnp.float32)
        ref = s._conv_i2s_direct(x, w, 1, 0, lax.Precision.HIGHEST)
        ref = s.instance_norm_act_s2d(ref + jnp.tile(b, 4), "relu")
        got = s.head_fold4_in_act_s2d(x, w, b, "relu",
                                      precision=lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_head_fold4_reflect_matches_padded_head():
    """The pad-free fold-4 head (zero-pad body + reflect strips) must
    equal reflect-pad + direct head + IN elementwise, borders and
    corners included."""
    from jax import lax

    from ir2rgb_tpu.nn import ops
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(5)
    for k, ci, co, S in [(7, 3, 16, 16), (7, 6, 4, 24), (3, 3, 8, 16)]:
        x = jnp.asarray(r.randn(1, S, S, ci), jnp.float32)
        w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
        b = jnp.asarray(r.randn(co), jnp.float32)
        xp = ops.reflect_pad(x, (k - 1) // 2)
        ref = s._conv_i2s_direct(xp, w, 1, 0, lax.Precision.HIGHEST)
        ref = s.instance_norm_act_s2d(ref + jnp.tile(b, 4), "relu")
        got = s.head_fold4_reflect_in_act_s2d(
            x, w, b, "relu", precision=lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_fold4_selection_matmul_forms_exact():
    """The round-3 fold/unfold lowerings (selection matmuls and the
    two-stage double-d2s interleave) must be bit-equal to the
    reshape/transpose reference forms, both channel orders."""
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(7)
    for H, W, c in [(16, 16, 3), (24, 16, 5), (32, 32, 1)]:
        x = jnp.asarray(r.randn(1, H, W, c), jnp.float32)
        ref4 = x.reshape(1, H // 4, 4, W // 4, 4, c)
        ref4 = ref4.transpose(0, 1, 3, 2, 4, 5).reshape(
            1, H // 4, W // 4, 16 * c)  # v-major fold, the reference
        got4 = s.fold4_of_image_dot(x)
        np.testing.assert_array_equal(np.asarray(got4), np.asarray(ref4))
        # every unfold lowering inverts the fold exactly
        np.testing.assert_array_equal(
            np.asarray(s.unfold4_dot(ref4, c, order="v")), np.asarray(x))
        np.testing.assert_array_equal(
            np.asarray(s.unfold4_double_d2s(ref4, c)), np.asarray(x))
        # deconv channel order: the dot form == the transpose form
        y4 = jnp.asarray(r.randn(1, H // 4, W // 4, 16 * c), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(s.unfold4_dot(y4, c, order="deconv")),
            np.asarray(s.unfold4_deconv(y4, c)))


def test_conv_fold4_to_s2d_exact():
    """The enhancer down1 reading the head's pre-d2s fold-4 rep
    (deconv channel order) must equal [unfold -> zero-pad stride-2 conv
    -> to_s2d] elementwise (round-3 2048p lowering)."""
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(8)
    for k, pad, ci, co, S in [(3, 1, 4, 6, 32), (3, 1, 2, 3, 16)]:
        y4 = jnp.asarray(
            r.randint(-3, 4, (1, S // 4, S // 4, 16 * ci)).astype(
                np.float32))
        w = jnp.asarray(
            r.randint(-3, 4, (k, k, ci, co)).astype(np.float32))
        img = s.unfold4_deconv(y4, ci)
        ref = lax.conv_general_dilated(
            img, w, (2, 2), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)
        ref = to_s2d(ref)
        got = s.conv_fold4_to_s2d(y4, w, pad=pad)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv_i2s_direct_nonsquare():
    """The fused image->s2d head on H != W inputs: per-dim output
    extents and trims (a 1024x1280 frame must not lose 64 columns)."""
    from ir2rgb_tpu.nn import s2d_space as s
    from ir2rgb_tpu.nn.s2d_conv import space_to_depth

    r = np.random.RandomState(11)
    for k, stride, h, w_, ci, co in [(7, 1, 22, 30, 3, 8),
                                     (3, 1, 18, 26, 3, 12),
                                     (3, 2, 37, 45, 6, 8),
                                     (4, 2, 38, 46, 6, 8)]:
        x = jnp.asarray(r.randn(1, h, w_, ci), jnp.float32)
        w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
        ref = lax.conv_general_dilated(
            x, w, (stride, stride), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST)
        ref = space_to_depth(ref)
        got = s._conv_i2s_direct(x, w, stride, 0, lax.Precision.HIGHEST)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_im2col_head_nonsquare():
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(12)
    for k, pad, h, w_, ci, co in [(7, 0, 22, 30, 3, 8),
                                  (3, 1, 18, 26, 3, 12)]:
        x = jnp.asarray(r.randn(1, h, w_, ci), jnp.float32)
        w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
        ref = s._conv_i2s_direct(
            jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            if pad else x, w, 1, 0, lax.Precision.HIGHEST)
        got = s.conv_image_to_s2d_im2col(x, w, pad=pad,
                                         precision=lax.Precision.HIGHEST)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_head_fold4_nonsquare():
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(13)
    k, ci, co, oh, ow = 7, 3, 8, 16, 32
    x = jnp.asarray(r.randn(1, oh + k - 1, ow + k - 1, ci), jnp.float32)
    w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(r.randn(co), jnp.float32)
    ref = s._conv_i2s_direct(x, w, 1, 0, lax.Precision.HIGHEST)
    ref = s.instance_norm_act_s2d(ref + jnp.tile(b, 4), "relu")
    got = s.head_fold4_in_act_s2d(x, w, b, "relu",
                                  precision=lax.Precision.HIGHEST)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_head_fold4_reflect_nonsquare():
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(14)
    k, ci, co, H, W = 7, 3, 8, 16, 24
    x = jnp.asarray(r.randn(1, H, W, ci), jnp.float32)
    w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
    b = jnp.asarray(r.randn(co), jnp.float32)
    xp = ops.reflect_pad(x, (k - 1) // 2)
    ref = s._conv_i2s_direct(xp, w, 1, 0, lax.Precision.HIGHEST)
    ref = s.instance_norm_act_s2d(ref + jnp.tile(b, 4), "relu")
    got = s.head_fold4_reflect_in_act_s2d(
        x, w, b, "relu", precision=lax.Precision.HIGHEST)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_conv_on_s2d_plain_rep_stride1_rejected():
    """out_s2d=False is only implemented for stride=2 — a stride-1 call
    must fail loudly, not silently return the s2d rep."""
    xs = to_s2d(_x(16, 4))
    w = jnp.zeros((3, 3, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="out_s2d"):
        conv_on_s2d(xs, w, stride=1, pad=1, out_s2d=False)


def test_head_fold4_reflect_corrected_stats():
    """IR2RGB_HEAD_STATS=corrected (stats from the unpatched body with
    inclusion-exclusion strip corrections — round-4 fusion experiment)
    must match the default patch-first path elementwise, borders and
    corners included, square and non-square, with and without bias."""
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(21)
    for k, ci, co, H, W, use_b in [(7, 3, 8, 16, 16, True),
                                   (7, 3, 8, 16, 24, False),
                                   (3, 6, 4, 24, 16, True)]:
        x = jnp.asarray(r.randn(1, H, W, ci), jnp.float32)
        w = jnp.asarray(r.randn(k, k, ci, co) * 0.1, jnp.float32)
        b = jnp.asarray(r.randn(co), jnp.float32) if use_b else None
        ref = s.head_fold4_reflect_in_act_s2d(
            x, w, b, "relu", precision=lax.Precision.HIGHEST)
        os.environ["IR2RGB_HEAD_STATS"] = "corrected"
        try:
            got = s.head_fold4_reflect_in_act_s2d(
                x, w, b, "relu", precision=lax.Precision.HIGHEST)
        finally:
            del os.environ["IR2RGB_HEAD_STATS"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_conv_reflect_in_act_corrected_stats():
    """conv_reflect_in_act_s2d (round-4: conv + border fixup + corrected
    IN stats in one call) must match conv_reflect_s2d -> bias -> IN
    elementwise for both res-block activations, square and non-square,
    including the small-shape fallback."""
    from ir2rgb_tpu.nn import s2d_space as s

    r = np.random.RandomState(22)
    for H, W, ci, co, use_b in [(20, 20, 8, 8, True), (24, 16, 4, 8, False),
                                (6, 6, 4, 4, True)]:  # 6x6: fallback path
        xs = to_s2d(jnp.asarray(r.randn(1, 2 * H, 2 * W, ci), jnp.float32))
        w = jnp.asarray(r.randn(3, 3, ci, co) * 0.2, jnp.float32)
        b = jnp.asarray(r.randn(co), jnp.float32) if use_b else None
        for act in ("relu", "none"):
            ref = s.conv_reflect_s2d(xs, w)
            if b is not None:
                ref = ref + jnp.tile(b, 4)
            ref = s.instance_norm_act_s2d(ref, act)
            got = s.conv_reflect_in_act_s2d(xs, w, b, act)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=1e-4)
