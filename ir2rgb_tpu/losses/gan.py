"""GAN losses over multiscale patch-logit pyramids.

Rebuild of the reference's ``GANLoss`` (``models/networks.py`` — SURVEY.md
§2.1): LSGAN (MSE against 1.0/0.0 target maps, the default) or vanilla
BCE-with-logits, broadcast to the patch-logit shape and summed over the
multiscale discriminator list. A hinge variant is included (standard in the
modern GAN literature; off by default).

All losses computed in fp32 (bf16-stability, SURVEY.md §7 hard-part #4).

Input structure: ``disc_out`` is the uniform multiscale structure returned
by ``ir2rgb_tpu.nn.define_d`` — a list over scales, each a list of
intermediate features with the logits map last.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

DiscOut = List[List[jax.Array]]


def _per_scale(logits: jax.Array, target_is_real: bool, mode: str,
               for_discriminator: bool) -> jax.Array:
    x = logits.astype(jnp.float32)
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((x - target) ** 2)
    if mode == "vanilla":
        target = jnp.ones_like(x) if target_is_real else jnp.zeros_like(x)
        # BCE with logits (numerically stable form)
        return jnp.mean(jnp.maximum(x, 0) - x * target
                        + jnp.log1p(jnp.exp(-jnp.abs(x))))
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return jnp.mean(jax.nn.relu(1.0 - x))
            return jnp.mean(jax.nn.relu(1.0 + x))
        # generator side: -E[D(fake)]
        return -jnp.mean(x)
    if mode == "wgangp":
        # Wasserstein critic values (the family's GANLoss('wgangp'));
        # the gradient penalty itself is a separate additive term —
        # see gradient_penalty() below.
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    raise ValueError(f"unknown gan mode: {mode}")


def gan_loss_g(disc_out_fake: DiscOut, mode: str = "lsgan") -> jax.Array:
    """Generator adversarial loss: push D(fake) toward 'real'."""
    loss = jnp.float32(0.0)
    for scale in disc_out_fake:
        loss = loss + _per_scale(scale[-1], True, mode,
                                 for_discriminator=False)
    return loss


def gan_loss_d(disc_out_real: DiscOut, disc_out_fake: DiscOut,
               mode: str = "lsgan") -> jax.Array:
    """Discriminator loss: 0.5 * (loss(real->1) + loss(fake->0)),
    matching the reference's per-step D objective."""
    loss_real, loss_fake = gan_loss_d_parts(disc_out_real, disc_out_fake,
                                            mode)
    return loss_real + loss_fake


def gradient_penalty(d_apply_fn, pair_real: jax.Array,
                     pair_fake: jax.Array, key: jax.Array,
                     lambda_gp: float = 10.0) -> jax.Array:
    """WGAN-GP penalty (the family's ``cal_gradient_penalty``, 'mixed'
    mode): λ · E[(‖∇x̂ D(x̂)‖₂ − 1)²] at x̂ = ε·real + (1−ε)·fake with
    per-sample ε ~ U[0,1].

    ``d_apply_fn``: x -> multiscale feats+logits structure (params
    closed over). The inner ∇x̂ is a jax.grad of the summed logits —
    grad-of-grad through the fused step gives the critic its penalty
    gradient, where torch needs create_graph=True autograd plumbing.
    Computed fully in fp32 (the norm is gradient-scale sensitive)."""
    b = pair_real.shape[0]
    eps = jax.random.uniform(key, (b, 1, 1, 1), jnp.float32)
    xhat = (eps * pair_real.astype(jnp.float32)
            + (1.0 - eps) * pair_fake.astype(jnp.float32))

    def critic_sum(x):
        out = d_apply_fn(x)
        return sum(jnp.sum(s[-1].astype(jnp.float32)) for s in out)

    g = jax.grad(critic_sum)(xhat)
    gnorm = jnp.sqrt(jnp.sum(g.reshape(b, -1) ** 2, axis=1) + 1e-16)
    return lambda_gp * jnp.mean((gnorm - 1.0) ** 2)


def gan_loss_d_parts(disc_out_real: DiscOut, disc_out_fake: DiscOut,
                     mode: str = "lsgan"):
    """(loss_real, loss_fake) halves — reported separately like the
    reference's [D_real, D_fake] loss vector."""
    loss_real = jnp.float32(0.0)
    loss_fake = jnp.float32(0.0)
    for scale in disc_out_real:
        loss_real = loss_real + _per_scale(scale[-1], True, mode, True)
    for scale in disc_out_fake:
        loss_fake = loss_fake + _per_scale(scale[-1], False, mode, True)
    return 0.5 * loss_real, 0.5 * loss_fake
