"""Pallas kernel tests — interpret mode on CPU (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.kernels.instance_norm import (
    _fused_bwd,
    instance_norm_act_pallas,
    instance_norm_act_reference,
)


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 128),   # aligned channel block
    (2, 8, 16, 256),    # multiple channel blocks
    (1, 32, 32, 384),   # three channel blocks
])
@pytest.mark.parametrize("act", ["none", "relu", "leaky_relu", "tanh"])
def test_fused_instance_norm_act_interpret(shape, act):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 1
    y_ref = instance_norm_act_reference(x, act)
    y_k = instance_norm_act_pallas(x, act, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_instance_norm_act_bf16():
    x = (jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 128))
         .astype(jnp.bfloat16))
    y_ref = instance_norm_act_reference(x, "relu")
    y_k = instance_norm_act_pallas(x, "relu", interpret=True)
    assert y_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y_k, np.float32),
                               np.asarray(y_ref, np.float32), atol=1e-2)


def test_multi_h_block_accumulation():
    """H larger than one block: the two-phase accumulator must still match."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 128, 128))
    y_ref = instance_norm_act_reference(x, "relu")
    y_k = instance_norm_act_pallas(x, "relu", interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("act", ["none", "relu", "leaky_relu", "tanh"])
def test_custom_vjp_matches_autodiff(act):
    """The hand-written backward must equal jax.grad of the reference."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16), jnp.float32)

    def scalar_ref(x):
        return jnp.sum(instance_norm_act_reference(x, act) * g)

    dx_ref = jax.grad(scalar_ref)(x)

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2))
    var = jnp.var(x32, axis=(1, 2))
    rstd = jax.lax.rsqrt(var + 1e-5)
    (dx,) = _fused_bwd(act, 1e-5, 0.2, (x, mean, rstd), g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=1e-4, rtol=1e-4)


class TestTailFused:
    """Fused tail kernel (reflect-pad + 7x7 conv + tanh + d2s) — exact
    vs the XLA s2d composition, interpret mode (round-1 verdict item #4:
    the region-fused Pallas swing; measured ~2x on the v5e, see
    kernels/tail_fused.py docstring)."""

    def _ref(self, xs, w, b):
        from ir2rgb_tpu.nn.s2d_space import (
            conv_on_s2d,
            from_s2d,
            reflect_pad_s2d,
        )
        y = conv_on_s2d(reflect_pad_s2d(xs, 3), w, stride=1, pad=0)
        return from_s2d(jnp.tanh(y + jnp.tile(b, 4)), 3)

    @pytest.mark.parametrize("hs,c", [(64, 32), (32, 64)])
    def test_exact_vs_xla_composition(self, hs, c):
        from ir2rgb_tpu.kernels.tail_fused import tail_fused
        r = np.random.RandomState(0)
        xs = jnp.asarray(r.randn(1, hs, hs, 4 * c).astype(np.float32))
        w = jnp.asarray(r.randn(7, 7, c, 3).astype(np.float32) * 0.1)
        b = jnp.asarray(r.randn(3).astype(np.float32))
        out = tail_fused(xs, w, b, tile=16, interpret=True)
        ref = self._ref(xs, w, b)
        assert out.shape == (1, 2 * hs, 2 * hs, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)

    def test_support_gate(self):
        from ir2rgb_tpu.kernels.tail_fused import tail_fused_supported
        assert tail_fused_supported((1, 256, 256, 128), (7, 7, 32, 3))
        assert tail_fused_supported((1, 128, 128, 256), (7, 7, 64, 3))
        assert not tail_fused_supported((2, 256, 256, 128), (7, 7, 32, 3))
        assert not tail_fused_supported((1, 250, 256, 128), (7, 7, 32, 3))
        assert not tail_fused_supported((1, 256, 256, 64), (7, 7, 16, 3))
        assert not tail_fused_supported((1, 256, 256, 128), (3, 3, 32, 3))


# ---------------------------------------------------------------------------
# depth-to-space / space-to-depth planar kernels (kernels/d2s.py)
# ---------------------------------------------------------------------------

class TestD2SKernel:
    def _y(self, hs, ws, co, dtype=jnp.float32, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(
            rng.rand(1, hs, ws, 4 * co).astype(np.float32)).astype(dtype)

    @pytest.mark.parametrize("hs,ws,co", [(8, 128, 3), (16, 256, 3),
                                          (8, 128, 1), (8, 128, 8)])
    def test_d2s_exact(self, hs, ws, co):
        from ir2rgb_tpu.kernels.d2s import d2s_pallas, d2s_reference
        y = self._y(hs, ws, co)
        np.testing.assert_array_equal(
            np.asarray(d2s_pallas(y, co, True)),
            np.asarray(d2s_reference(y, co)))

    def test_s2d_exact_and_inverse(self):
        from ir2rgb_tpu.kernels.d2s import (
            d2s_pallas, s2d_pallas, s2d_reference)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 16, 256, 3).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(s2d_pallas(x, True)), np.asarray(s2d_reference(x)))
        # round trip is the identity
        np.testing.assert_array_equal(
            np.asarray(d2s_pallas(s2d_pallas(x, True), 3, True)),
            np.asarray(x))

    def test_d2s_vjp_exact(self):
        from ir2rgb_tpu.kernels.d2s import d2s_pallas, d2s_reference
        y = self._y(8, 128, 3, seed=2)
        cot = jnp.asarray(
            np.random.RandomState(3).rand(1, 16, 256, 3).astype(np.float32))
        g = jax.grad(lambda v: jnp.sum(d2s_pallas(v, 3, True) * cot))(y)
        g_ref = jax.grad(lambda v: jnp.sum(d2s_reference(v, 3) * cot))(y)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))

    def test_d2s_bf16(self):
        from ir2rgb_tpu.kernels.d2s import d2s_pallas, d2s_reference
        y = self._y(8, 128, 3, dtype=jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(d2s_pallas(y, 3, True)).astype(np.float32),
            np.asarray(d2s_reference(y, 3)).astype(np.float32))

    def test_d2s_conv_lowering_exact(self):
        from ir2rgb_tpu.nn.s2d_conv import _d2s_conv
        from ir2rgb_tpu.kernels.d2s import d2s_reference
        y = self._y(8, 128, 3, seed=4)
        np.testing.assert_allclose(
            np.asarray(_d2s_conv(y, 3)), np.asarray(d2s_reference(y, 3)),
            atol=0, rtol=0)

    def test_support_gate(self):
        from ir2rgb_tpu.kernels.d2s import d2s_supported
        assert d2s_supported((1, 256, 256, 12), 3)
        assert not d2s_supported((2, 256, 256, 12), 3)   # batch > 1
        assert not d2s_supported((1, 256, 250, 12), 3)   # lanes misaligned
        assert not d2s_supported((1, 256, 256, 12), 4)   # c4 != 4*co

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("co", [1, 3])
    def test_d2s_dot_exact(self, dtype, co):
        # the TPU production lowering (selection matmuls) must be
        # element-exact against the transpose reference in both dtypes
        from ir2rgb_tpu.nn.s2d_conv import _d2s_dot
        from ir2rgb_tpu.kernels.d2s import d2s_reference
        y = self._y(8, 128, co, dtype=dtype, seed=5)
        np.testing.assert_array_equal(
            np.asarray(_d2s_dot(y, co)).astype(np.float32),
            np.asarray(d2s_reference(y, co)).astype(np.float32))
