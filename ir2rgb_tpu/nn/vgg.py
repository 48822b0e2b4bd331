"""VGG19 feature extractor for the perceptual loss.

Rebuild of the reference's ``Vgg19`` module (``models/networks.py`` —
SURVEY.md §2.1 "VGGLoss + Vgg19"): torchvision VGG19 ``features`` sliced at
the relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1 boundaries into five
stages; the perceptual loss L1-compares the five stage outputs with weights
[1/32, 1/16, 1/8, 1/4, 1].

Weight sourcing: torchvision is not installed in this environment and there
is no network egress, so pretrained ImageNet weights must be supplied as a
file (``load_vgg19_npz`` — produced offline from torchvision's
``vgg19-dcbb9e9d.pth`` via ``ir2rgb_tpu.checkpoint.torch_import.
convert_vgg19_pth``). Without a weight file, ``vgg19_init`` falls back to a
deterministic He-style random init: the loss machinery, gradients, shapes
and tests all exercise identically; only the perceptual metric's ImageNet
semantics are absent. The fallback is clearly flagged via
``Vgg19Params.pretrained``.

Input convention: images in [-1, 1] (the GAN's native range). The stage-0
preprocessing converts to ImageNet-normalized RGB exactly as the reference
family does ((x+1)/2, then mean/std normalize) — SURVEY.md §7 hard-part #3.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .ops import Params

# torchvision vgg19.features conv layer channel plan, with stage boundaries
# after each relu*_1 (feature-matching taps).
# stage -> list of (cin, cout) convs inside that stage; maxpool between
# stages where the torch indices cross a pool.
_STAGES = [
    [(3, 64)],                                      # -> relu1_1
    [(64, 64), "pool", (64, 128)],                  # -> relu2_1
    [(128, 128), "pool", (128, 256)],               # -> relu3_1
    [(256, 256), (256, 256), (256, 256), "pool", (256, 512)],  # -> relu4_1
    [(512, 512), (512, 512), (512, 512), "pool", (512, 512)],  # -> relu5_1
]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass
class Vgg19Params:
    params: Params
    pretrained: bool


def vgg19_init(key: Optional[jax.Array] = None,
               weights_npz: Optional[str] = None) -> Vgg19Params:
    """Load pretrained weights from an .npz (keys ``conv{i}_w``/``conv{i}_b``
    in HWIO order) or fall back to deterministic random init."""
    if weights_npz is not None:
        data = np.load(weights_npz)
        params: Params = {}
        i = 0
        for stage in _STAGES:
            for item in stage:
                if item == "pool":
                    continue
                params[f"conv{i}"] = {
                    "w": jnp.asarray(data[f"conv{i}_w"]),
                    "b": jnp.asarray(data[f"conv{i}_b"]),
                }
                i += 1
        return Vgg19Params(params=params, pretrained=True)
    if key is None:
        key = jax.random.PRNGKey(0)
    params = {}
    i = 0
    for stage in _STAGES:
        for item in stage:
            if item == "pool":
                continue
            cin, cout = item
            key, sub = jax.random.split(key)
            # He init: random features still expose structure for the loss
            scale = np.sqrt(2.0 / (9 * cin))
            params[f"conv{i}"] = {
                "w": jax.random.normal(sub, (3, 3, cin, cout),
                                       jnp.float32) * scale,
                "b": jnp.zeros((cout,), jnp.float32),
            }
            i += 1
    return Vgg19Params(params=params, pretrained=False)


def _max_pool(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1),
                                 [(0, 0), (0, 0), (0, 0), (0, 0)])


def vgg19_features(vgg: Params, x: jax.Array,
                   num_stages: int = 5,
                   allow_s2d: bool = True,
                   dtype=None) -> List[jax.Array]:
    """Five-stage feature pyramid of an NHWC image batch in [-1, 1].

    High-resolution inputs (>=128px, even) run in persistent s2d space
    (nn/s2d_space.py): convs enter via the fused image->s2d kernel, the
    2x2 max-pools are elementwise maxima over the phase blocks, and the
    stage taps come back as s2d reps — the same multiset of values, so
    the perceptual loss's per-stage means are exactly the image-space
    ones. Pass ``allow_s2d=False`` for image-shaped feature maps.

    ``dtype=jnp.bfloat16`` runs the trunk in bf16 (the loss path on TPU:
    f32-HIGHEST convs cost 6 MXU passes each and the perceptual loss
    doesn't need them; ImageNet normalization stays f32).
    """
    from jax import lax
    from .s2d_space import (
        conv_image_to_s2d,
        conv_on_s2d,
        max_pool_2x2_s2d,
    )
    x = x.astype(jnp.float32)
    x = (x + 1.0) * 0.5
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    if dtype is not None:
        x = x.astype(dtype)
    prec = (lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)

    def wb(p):
        if dtype is None:
            return p["w"], p["b"]
        return p["w"].astype(dtype), p["b"].astype(dtype)

    feats: List[jax.Array] = []
    h: Optional[jax.Array] = x   # plain-rep carry
    hs: Optional[jax.Array] = None  # s2d-rep carry (exactly one is set)
    i = 0
    for stage in _STAGES[:num_stages]:
        for item in stage:
            if item == "pool":
                if hs is not None:
                    h, hs = max_pool_2x2_s2d(hs), None
                else:
                    h = _max_pool(h)
                continue
            p = vgg[f"conv{i}"]
            w, b = wb(p)
            if hs is not None:
                hs = jax.nn.relu(
                    conv_on_s2d(hs, w, stride=1, pad=1, precision=prec)
                    + jnp.tile(b, 4))
            elif (allow_s2d and h.shape[1] >= 128 and h.shape[1] % 2 == 0
                  and h.shape[2] % 2 == 0):
                hs = jax.nn.relu(
                    conv_image_to_s2d(h, w, stride=1, pad=1, precision=prec)
                    + jnp.tile(b, 4))
                h = None
            else:
                h = jax.nn.relu(ops.conv_apply(
                    p, h, padding=1,
                    compute_dtype=dtype))
            i += 1
        feats.append(hs if hs is not None else h)
    return feats
