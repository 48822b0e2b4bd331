"""Training entry point — reference ``python train.py`` analog
(SURVEY.md §3.1), driven by the typed config system.

Example:
    python -m ir2rgb_tpu.cli.train --preset pix2pix_unet256 \
        --data.dataroot /data/ir2rgb --train.name run1
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    from ir2rgb_tpu.config import parse_cli
    from ir2rgb_tpu.data import (
        DataLoader,
        preprocess_pair_batch,
        preprocess_sequence_batch,
    )
    from ir2rgb_tpu.obs import Visualizer
    from ir2rgb_tpu.train import Trainer, create_model

    cfg = parse_cli(argv)
    from ir2rgb_tpu.nn import quant
    if quant.env_override() or cfg.infer.quant != "none":
        # int8 rounding has zero gradient — a quantized train step would
        # silently learn nothing (nn/quant.py is a serving-only path)
        raise SystemExit(
            "quantized mode is serving-only (IR2RGB_QUANT / "
            "--infer.quant): unset it to train")
    if cfg.data.dataset_mode == "single":
        raise SystemExit(
            "dataset_mode=single has no ground-truth RGB targets — it is "
            "a test.py-only mode; training needs aligned (or temporal) "
            "pairs")
    if cfg.train.multihost:
        from ir2rgb_tpu.parallel import multihost
        # explicit user intent: a failed cluster bring-up must raise, not
        # silently fall back to N independent single-process runs that
        # clobber a shared run_dir
        multihost.initialize(require=True)
    loader = DataLoader(cfg)
    steps_per_epoch = max(len(loader), 1)
    model = create_model(cfg, steps_per_epoch=steps_per_epoch)
    vis = Visualizer(cfg.run_dir(), cfg.train.name)
    trainer = Trainer(model, cfg, visualizer=vis)

    temporal = cfg.data.dataset_mode == "temporal"
    unpaired = cfg.data.dataset_mode == "unaligned"
    if cfg.model.model == "cycle_gan" and temporal:
        raise SystemExit(
            "cycle_gan expects frame batches (aligned or unaligned "
            "dataset_mode), not temporal windows")
    prep = preprocess_sequence_batch if temporal else preprocess_pair_batch
    key = jax.random.PRNGKey(cfg.train.seed)
    aug_key = jax.random.PRNGKey(cfg.train.seed + 1)

    # non-crop preprocess modes (scale_width / none) train at decode size
    crop = (cfg.data.crop_size if "crop" in cfg.data.preprocess else None)

    def batches():
        nonlocal aug_key
        for host_batch in loader:
            aug_key, sub = jax.random.split(aug_key)
            kw = {}
            if not temporal and "inst" in host_batch:
                kw["inst"] = jnp.asarray(host_batch["inst"])
            if not temporal and cfg.model.label_nc > 0:
                kw["label_a"] = True
            if unpaired:
                # unrelated A/B frames: independent crop/flip per side
                kw["unpaired"] = True
            yield prep(jnp.asarray(host_batch["a"]),
                       jnp.asarray(host_batch["b"]), sub,
                       crop_size=crop,
                       no_flip=cfg.data.no_flip, train=True, **kw)

    it = batches()
    first = next(it)
    state = trainer.init_or_restore(key, first)

    def stream():
        yield first
        yield from it

    state = trainer.fit(state, stream())

    # final sample dump through the trainer's display hook, so
    # feat/edge/label-conditioned models show the conditioned forward
    # (not the zeros prior) and label inputs get the Colorize palette —
    # same rendering the in-training dashboard uses
    trainer._display(state, first, int(jax.device_get(state.step)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
