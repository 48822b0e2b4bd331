"""Image quality metrics — PSNR / SSIM (the reference family's evaluation
protocol, SURVEY.md §4: outputs scored against ground-truth RGB) plus a
temporal-flicker metric for video mode.

Jitted, NHWC, peak=2 for [-1,1] tensors (peak=255 for uint8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, peak: float = 2.0) -> jnp.ndarray:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


@functools.partial(jax.jit, static_argnames=("peak",))
def ssim(a, b, peak: float = 2.0) -> jnp.ndarray:
    """Standard single-scale SSIM with 11x11 Gaussian window (per-channel,
    averaged). Inputs NHWC or HWC in [-peak/2*?].. canonical [-1,1]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    kern = _gaussian_kernel()[:, :, None, None]

    def filt(x):
        # depthwise 11x11 gaussian
        c = x.shape[-1]
        k = jnp.tile(kern, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = filt(a * a) - mu_a2
    sig_b = filt(b * b) - mu_b2
    sig_ab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sig_a + sig_b + c2))
    return jnp.mean(s)


def flicker(frames) -> jnp.ndarray:
    """Mean absolute frame-to-frame difference (T, H, W, C) or (T, B, ...):
    the temporal-stability metric for video colorization (lower = less
    flicker; BASELINE.json:10's 'flicker-free' objective)."""
    f = jnp.asarray(frames, jnp.float32)
    return jnp.mean(jnp.abs(f[1:] - f[:-1]))
