"""Reconstruction / perceptual losses.

Rebuild of the reference's L1, discriminator feature-matching, and VGG
perceptual losses (``models/networks.py`` — SURVEY.md §2.1):

- ``l1_loss``: pix2pix's lambda_L1-weighted L1 (BASELINE.json:8).
- ``feature_matching_loss``: L1 between D's intermediate features for real
  vs fake, scaled 4/n_layers per tap and 1/num_D per scale, weight
  lambda_feat (family formula).
- ``vgg_loss``: sum_i w_i * L1(vgg(fake)_i, sg(vgg(real)_i)) with
  w = [1/32, 1/16, 1/8, 1/4, 1] (BASELINE.json:9).

All in fp32.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ir2rgb_tpu.nn.vgg import vgg19_features

VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def l1_loss(fake: jax.Array, real: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(fake.astype(jnp.float32)
                            - real.astype(jnp.float32)))


def feature_matching_loss(disc_out_fake: List[List[jax.Array]],
                          disc_out_real: List[List[jax.Array]],
                          n_layers: int = 3) -> jax.Array:
    """Matches the family's weighting: per-tap factor 4/(n_layers+1),
    per-scale factor 1/num_D; real features are stop-gradiented (the fake
    path alone drives G)."""
    num_d = len(disc_out_fake)
    feat_w = 4.0 / (n_layers + 1)
    d_w = 1.0 / num_d
    loss = jnp.float32(0.0)
    for fake_scale, real_scale in zip(disc_out_fake, disc_out_real):
        # every tap except the final logits map
        for ff, fr in zip(fake_scale[:-1], real_scale[:-1]):
            fr = jax.lax.stop_gradient(fr)
            loss = loss + d_w * feat_w * jnp.mean(
                jnp.abs(ff.astype(jnp.float32) - fr.astype(jnp.float32)))
    return loss


def vgg_loss(vgg_params, fake: jax.Array, real: jax.Array,
             dtype=None) -> jax.Array:
    """dtype=bfloat16 runs the VGG trunk in bf16 (TPU training path);
    the per-stage L1 reductions stay fp32."""
    feats_fake = vgg19_features(vgg_params, fake, dtype=dtype)
    feats_real = vgg19_features(vgg_params, jax.lax.stop_gradient(real),
                                dtype=dtype)
    loss = jnp.float32(0.0)
    for w, ff, fr in zip(VGG_WEIGHTS, feats_fake, feats_real):
        fr = jax.lax.stop_gradient(fr)
        diff = (ff.astype(jnp.float32) - fr.astype(jnp.float32))
        loss = loss + w * jnp.mean(jnp.abs(diff))
    return loss
