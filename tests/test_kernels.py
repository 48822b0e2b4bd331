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
