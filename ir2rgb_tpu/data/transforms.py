"""On-device paired augmentation — jitted, HBM-resident.

Rebuild of the reference's ``data/base_dataset.py`` transforms
(SURVEY.md §2.3: resize → random crop → horizontal flip → normalize to
[-1, 1], with **identical parameters applied to the IR and RGB frame of a
pair** — the "paired IR/RGB augmentation" of BASELINE.json:5).

TPU-first split of responsibilities: the host decodes and resizes frames to
``load_size`` uint8 (variable-size decode can't live under jit); everything
random and arithmetic — paired crop offsets, flip, [0,255]→[-1,1] — runs
on device in one jitted function over the whole batch, so augmented batches
are born in HBM and never round-trip.

A single PRNG key drives both frames of each pair (SURVEY.md §4.1
"transform determinism").
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _normalize(x_uint8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[0,255] uint8 -> [-1,1] (mean .5 / std .5 per channel, as the
    reference's Normalize((0.5,...),(0.5,...)))."""
    return (x_uint8.astype(dtype) / 127.5) - 1.0


def _paired_crop_flip(a: jax.Array, b: jax.Array, key: jax.Array,
                      crop: int, flip_enabled: bool
                      ) -> Tuple[jax.Array, jax.Array]:
    """One pair (H, W, C): same random crop offset + flip for both."""
    h, w = a.shape[0], a.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    oy = jax.random.randint(k1, (), 0, h - crop + 1)
    ox = jax.random.randint(k2, (), 0, w - crop + 1)
    a = jax.lax.dynamic_slice(a, (oy, ox, 0), (crop, crop, a.shape[2]))
    b = jax.lax.dynamic_slice(b, (oy, ox, 0), (crop, crop, b.shape[2]))
    if flip_enabled:
        do_flip = jax.random.bernoulli(k3)
        a = jnp.where(do_flip, a[:, ::-1, :], a)
        b = jnp.where(do_flip, b[:, ::-1, :], b)
    return a, b


@functools.partial(jax.jit, static_argnames=("crop_size", "no_flip",
                                              "train", "label_a",
                                              "unpaired"))
def preprocess_pair_batch(a_uint8: jax.Array, b_uint8: jax.Array,
                          key: jax.Array, crop_size: Optional[int],
                          no_flip: bool = False,
                          train: bool = True,
                          inst: Optional[jax.Array] = None,
                          label_a: bool = False,
                          unpaired: bool = False
                          ) -> Dict[str, jax.Array]:
    """(B, loadH, loadW, C) uint8 pairs -> augmented normalized batch.

    crop_size=None: no cropping (the reference's scale_width/none
    preprocess modes) — flip + normalize only.
    Eval path (train=False): deterministic center crop, no flip.
    ``inst``: optional (B, loadH, loadW) int instance-id maps — the SAME
    spatial transform is applied (by replaying the per-item RNG keys),
    never normalized (pix2pixHD --instance_feat path).
    ``label_a``: the A side is an integer class-id map (model.label_nc >
    0) — cropped/flipped like the image but NOT normalized; emitted as
    int32 ids for the model's on-device one-hot encode.
    ``unpaired``: dataset_mode=unaligned (CycleGAN) — the A and B frames
    are unrelated, so each side draws its OWN crop offset and flip
    decision (the family applies independent transforms per domain);
    mutually exclusive with ``inst``/``label_a``.
    """
    bsz = a_uint8.shape[0]
    if unpaired:
        assert inst is None and not label_a, \
            "unpaired transforms do not combine with inst/label maps"
    inst4 = inst[..., None] if inst is not None else None  # (B,H,W,1)
    if crop_size is None:
        a, b = a_uint8, b_uint8
        if train and not no_flip:
            keys = jax.random.split(key, bsz)

            def flip_fn(ai, bi, k):
                do = jax.random.bernoulli(k)
                return (jnp.where(do, ai[:, ::-1, :], ai),
                        jnp.where(do, bi[:, ::-1, :], bi))

            if unpaired:
                keys_b = jax.random.split(jax.random.fold_in(key, 1), bsz)
                a, _ = jax.vmap(flip_fn)(a, a, keys)
                b, _ = jax.vmap(flip_fn)(b, b, keys_b)
            else:
                a, b = jax.vmap(flip_fn)(a, b, keys)
                if inst4 is not None:
                    inst4, _ = jax.vmap(flip_fn)(inst4, inst4, keys)
    elif train:
        keys = jax.random.split(key, bsz)
        crop_fn = functools.partial(_paired_crop_flip, crop=crop_size,
                                    flip_enabled=not no_flip)
        if unpaired:
            keys_b = jax.random.split(jax.random.fold_in(key, 1), bsz)
            a, _ = jax.vmap(crop_fn)(a_uint8, a_uint8, keys)
            b, _ = jax.vmap(crop_fn)(b_uint8, b_uint8, keys_b)
        else:
            a, b = jax.vmap(crop_fn)(a_uint8, b_uint8, keys)
            if inst4 is not None:
                # same keys -> same crop offsets + flip decisions (CSE'd)
                inst4, _ = jax.vmap(crop_fn)(inst4, inst4, keys)
    else:
        h, w = a_uint8.shape[1], a_uint8.shape[2]
        oy, ox = (h - crop_size) // 2, (w - crop_size) // 2
        a = a_uint8[:, oy:oy + crop_size, ox:ox + crop_size, :]
        b = b_uint8[:, oy:oy + crop_size, ox:ox + crop_size, :]
        if inst4 is not None:
            inst4 = inst4[:, oy:oy + crop_size, ox:ox + crop_size, :]
    out = {"a": a.astype(jnp.int32) if label_a else _normalize(a),
           "b": _normalize(b)}
    if inst4 is not None:
        out["inst"] = inst4[..., 0].astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnames=("crop_size", "no_flip", "train"))
def preprocess_sequence_batch(a_uint8: jax.Array, b_uint8: jax.Array,
                              key: jax.Array, crop_size: Optional[int],
                              no_flip: bool = False,
                              train: bool = True) -> Dict[str, jax.Array]:
    """(B, T, loadH, loadW, C) uint8 windows -> augmented batch.

    One crop/flip decision per *window* (temporal consistency: every frame
    of a sequence gets the same spatial transform).

    crop_size=None: no cropping (scale_width / none preprocess modes) —
    one flip decision per window, then normalize, mirroring
    ``preprocess_pair_batch``.
    """
    bsz, t = a_uint8.shape[0], a_uint8.shape[1]
    if crop_size is None:
        a, b = a_uint8, b_uint8
        if train and not no_flip:
            keys = jax.random.split(key, bsz)

            def flip_fn(a_seq, b_seq, k):
                do = jax.random.bernoulli(k)
                return (jnp.where(do, a_seq[:, :, ::-1, :], a_seq),
                        jnp.where(do, b_seq[:, :, ::-1, :], b_seq))

            a, b = jax.vmap(flip_fn)(a, b, keys)
    elif train:
        keys = jax.random.split(key, bsz)

        def window_fn(a_seq, b_seq, k):
            # fold time into channels so one crop applies to all frames
            h, w, c = a_seq.shape[1], a_seq.shape[2], a_seq.shape[3]
            cb = b_seq.shape[3]
            a_flat = jnp.moveaxis(a_seq, 0, -2).reshape(h, w, t * c)
            b_flat = jnp.moveaxis(b_seq, 0, -2).reshape(h, w, t * cb)
            a_c, b_c = _paired_crop_flip(a_flat, b_flat, k, crop_size,
                                         not no_flip)
            a_out = jnp.moveaxis(
                a_c.reshape(crop_size, crop_size, t, c), -2, 0)
            b_out = jnp.moveaxis(
                b_c.reshape(crop_size, crop_size, t, cb), -2, 0)
            return a_out, b_out

        a, b = jax.vmap(window_fn)(a_uint8, b_uint8, keys)
    else:
        h, w = a_uint8.shape[2], a_uint8.shape[3]
        oy, ox = (h - crop_size) // 2, (w - crop_size) // 2
        a = a_uint8[:, :, oy:oy + crop_size, ox:ox + crop_size, :]
        b = b_uint8[:, :, oy:oy + crop_size, ox:ox + crop_size, :]
    return {"a": _normalize(a), "b": _normalize(b)}
