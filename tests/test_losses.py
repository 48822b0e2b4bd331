"""Loss-function golden tests vs torch formulations (SURVEY.md §4.1)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ir2rgb_tpu.losses import (
    feature_matching_loss,
    gan_loss_d,
    gan_loss_g,
    l1_loss,
    vgg_loss,
)
from ir2rgb_tpu.losses.gan import gan_loss_d_parts

torch.backends.mkldnn.enabled = False


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_lsgan_g_matches_mse():
    logits = _rand((1, 7, 7, 1), 0)
    loss = float(gan_loss_g([[jnp.asarray(logits)]], "lsgan"))
    expected = float(torch.nn.functional.mse_loss(
        torch.from_numpy(logits), torch.ones(1, 7, 7, 1)))
    assert loss == pytest.approx(expected, rel=1e-6)


def test_lsgan_d_is_half_sum():
    real = _rand((1, 7, 7, 1), 1)
    fake = _rand((1, 7, 7, 1), 2)
    loss = float(gan_loss_d([[jnp.asarray(real)]], [[jnp.asarray(fake)]],
                            "lsgan"))
    e_real = float(torch.nn.functional.mse_loss(
        torch.from_numpy(real), torch.ones(1, 7, 7, 1)))
    e_fake = float(torch.nn.functional.mse_loss(
        torch.from_numpy(fake), torch.zeros(1, 7, 7, 1)))
    assert loss == pytest.approx(0.5 * (e_real + e_fake), rel=1e-6)


def test_vanilla_matches_bce_with_logits():
    logits = _rand((2, 5, 5, 1), 3)
    loss = float(gan_loss_g([[jnp.asarray(logits)]], "vanilla"))
    expected = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.ones(2, 5, 5, 1)))
    assert loss == pytest.approx(expected, rel=1e-5)


def test_multiscale_gan_loss_sums_over_scales():
    l1 = _rand((1, 7, 7, 1), 4)
    l2 = _rand((1, 3, 3, 1), 5)
    single = (float(gan_loss_g([[jnp.asarray(l1)]], "lsgan"))
              + float(gan_loss_g([[jnp.asarray(l2)]], "lsgan")))
    multi = float(gan_loss_g([[jnp.asarray(l1)], [jnp.asarray(l2)]],
                             "lsgan"))
    assert multi == pytest.approx(single, rel=1e-6)


def test_l1_matches_torch():
    a, b = _rand((2, 8, 8, 3), 6), _rand((2, 8, 8, 3), 7)
    loss = float(l1_loss(jnp.asarray(a), jnp.asarray(b)))
    expected = float(torch.nn.functional.l1_loss(torch.from_numpy(a),
                                                 torch.from_numpy(b)))
    assert loss == pytest.approx(expected, rel=1e-6)


def test_feature_matching_weighting():
    """Family formula: sum over scales/taps of (4/(n_layers+1)) * (1/num_D)
    * L1."""
    n_layers = 3
    fake = [[jnp.asarray(_rand((1, 8, 8, 4), 10 + i + 10 * s))
             for i in range(5)] for s in range(2)]
    real = [[jnp.asarray(_rand((1, 8, 8, 4), 50 + i + 10 * s))
             for i in range(5)] for s in range(2)]
    loss = float(feature_matching_loss(fake, real, n_layers))
    expected = 0.0
    for s in range(2):
        for i in range(4):  # excludes final logits
            expected += (4.0 / (n_layers + 1)) * 0.5 * float(
                np.mean(np.abs(np.asarray(fake[s][i])
                               - np.asarray(real[s][i]))))
    assert loss == pytest.approx(expected, rel=1e-5)


def test_vgg_loss_runs_and_weights():
    from ir2rgb_tpu.nn import vgg19_init
    vgg = vgg19_init(jax.random.PRNGKey(0)).params
    a = jnp.asarray(_rand((1, 64, 64, 3), 20)).clip(-1, 1)
    b = jnp.asarray(_rand((1, 64, 64, 3), 21)).clip(-1, 1)
    loss = float(vgg_loss(vgg, a, b))
    assert np.isfinite(loss) and loss > 0
    assert float(vgg_loss(vgg, a, a)) == pytest.approx(0.0, abs=1e-6)


def test_vgg_gradient_flows_to_fake_only():
    from ir2rgb_tpu.nn import vgg19_init
    vgg = vgg19_init(jax.random.PRNGKey(0)).params
    a = jnp.asarray(_rand((1, 32, 32, 3), 22)).clip(-1, 1)
    b = jnp.asarray(_rand((1, 32, 32, 3), 23)).clip(-1, 1)
    ga = jax.grad(lambda x: vgg_loss(vgg, x, b))(a)
    gb = jax.grad(lambda x: vgg_loss(vgg, a, x))(b)
    assert float(jnp.abs(ga).max()) > 0
    assert float(jnp.abs(gb).max()) == 0.0  # real side stop-gradiented


def test_wgangp_loss_values():
    """Wasserstein critic values: G and D sides on known logits."""
    from ir2rgb_tpu.losses.gan import gan_loss_d_parts, gan_loss_g

    logits = jnp.full((1, 4, 4, 1), 3.0)
    out = [[logits]]
    # G: -E[D(fake)]
    assert float(gan_loss_g(out, "wgangp")) == pytest.approx(-3.0)
    # D: 0.5*(-E[D(real)]), 0.5*(E[D(fake)])
    real, fake = gan_loss_d_parts(out, out, "wgangp")
    assert float(real) == pytest.approx(-1.5)
    assert float(fake) == pytest.approx(1.5)


def test_gradient_penalty_analytic():
    """Linear critic D(x) = 2*sum(x): gradient is 2 everywhere, so the
    per-sample norm is 2*sqrt(N) independent of the interpolation point
    and the penalty is exactly lambda*(2*sqrt(N)-1)^2."""
    import numpy as np

    from ir2rgb_tpu.losses.gan import gradient_penalty

    b, h, w, c = 2, 4, 4, 3
    n = h * w * c
    real = jnp.asarray(np.random.RandomState(0).rand(b, h, w, c),
                       jnp.float32)
    fake = jnp.asarray(np.random.RandomState(1).rand(b, h, w, c),
                       jnp.float32)
    d_apply = lambda x: [[2.0 * x]]
    gp = gradient_penalty(d_apply, real, fake, jax.random.PRNGKey(0),
                          lambda_gp=10.0)
    expected = 10.0 * (2.0 * np.sqrt(n) - 1.0) ** 2
    assert float(gp) == pytest.approx(expected, rel=1e-5)


def test_wgangp_train_step():
    """Full fused step in wgangp mode: GP metric present and finite,
    both nets get finite updates (grad-of-grad through the critic)."""
    import dataclasses

    import numpy as np

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS["pix2pix_unet256"]
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, net_g="resnet_6blocks",
                                  ngf=8, ndf=8, net_d="pixel"),
        loss=dataclasses.replace(cfg.loss, gan_mode="wgangp",
                                 no_gan_feat_loss=True))
    model = create_model(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(0)
    batch = {"a": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
             "b": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state2, metrics = jax.jit(model.train_step)(state, batch)
    assert "D_GP" in metrics and np.isfinite(float(metrics["D_GP"]))
    assert float(metrics["D_GP"]) > 0.0
    d_delta = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.d_params, state2.d_params))
    assert max(d_delta) > 0.0 and all(np.isfinite(d_delta))
