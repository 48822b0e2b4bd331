"""Shared CLI plumbing: serving-generator weight resolution.

Both serving entry points (test.py galleries and the ir2rgb-serve
daemon) load generator weights the same three ways — a named-epoch Orbax
run checkpoint, its EMA shadow, or a reference torch ``.pth`` in parity
mode (reference --which_epoch semantics, SURVEY.md §3.2/§3.4).
"""

from __future__ import annotations

import os
from typing import Optional


def pop_flag(argv: list, name: str) -> Optional[str]:
    """Extract a ``--name value`` pair that isn't part of the typed
    config surface (e.g. --torch_g) from an argv list, in place."""
    if name in argv:
        i = argv.index(name)
        if i + 1 >= len(argv):
            raise SystemExit(f"{name} requires a value")
        value = argv[i + 1]
        del argv[i:i + 2]
        return value
    return None


def load_generator_params(cfg, model, torch_g: Optional[str] = None):
    """Resolve serving weights for ``model`` per ``cfg.infer`` flags.

    ``torch_g`` (reference parity mode) imports a raw ``.pth``; otherwise
    the run's Orbax checkpoint at ``--infer.which_epoch``, optionally the
    EMA shadow (``--infer.use_ema``). Raises SystemExit with the same
    loud messages the test.py driver always had."""
    from ir2rgb_tpu.checkpoint import CheckpointManager, import_generator

    if torch_g is not None:
        if cfg.infer.use_ema:
            raise SystemExit("--infer.use_ema needs an Orbax run "
                             "checkpoint; --torch_g imports raw reference "
                             "weights (no EMA state)")
        g_params = import_generator(torch_g, model.gen_cfg)
        if cfg.model.model == "cycle_gan":
            # a reference CycleGAN checkpoint is per-net
            # (latest_net_G_A.pth); serving only touches G_A
            g_params = {"G_A": g_params}
        return g_params

    ckpt = CheckpointManager(os.path.join(cfg.run_dir(), "ckpt"))
    # reference --which_epoch: serve a named epoch, not only latest
    step = ckpt.step_for_label(cfg.infer.which_epoch)
    state = ckpt.restore(step)
    if cfg.infer.use_ema:
        g_params = (state.get("ema_g") if isinstance(state, dict)
                    else getattr(state, "ema_g", None))
        if not g_params:
            raise SystemExit(
                "--infer.use_ema: this checkpoint has no EMA weights "
                "(train with --train.ema_decay > 0)")
        return g_params
    return state["g_params"] if isinstance(state, dict) else state.g_params
