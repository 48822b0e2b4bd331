"""Learning-rate schedule and coarse-to-fine parameter gating.

Reference semantics (SURVEY.md §2.2, §3.5): Adam at constant lr for
``niter`` epochs, then linear decay to 0 over ``niter_decay`` epochs
(updated once per epoch); pix2pixHD additionally freezes the global
generator for the first ``niter_fix_global`` epochs.

Both are expressed purely as functions of the step counter so the whole
train step stays a single compiled program — no optimizer rebuilds, no
Python-side schedule state (the reference mutates optimizer param groups
mid-training; here it's a multiplicative gate, SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def linear_decay_schedule(lr: float, niter: int, niter_decay: int,
                          steps_per_epoch: int) -> Callable[[jax.Array],
                                                            jax.Array]:
    """Per-step lr: constant for niter epochs, then linear to 0.

    Matches the reference's per-epoch staircase exactly: the reference
    decrements lr by ``lr/niter_decay`` at the END of every epoch past
    ``niter``, so the first decay epoch still trains at ``lr`` and the
    final (niter+niter_decay-th) epoch trains at ``lr/niter_decay``.
    With 0-based epoch e: ``lr * (1 - max(0, e - niter)/niter_decay)``."""

    def schedule(step):
        epoch = step // steps_per_epoch  # 0-based
        decay_epochs = jnp.maximum(epoch - niter, 0)
        frac = 1.0 - decay_epochs / max(niter_decay, 1)
        return lr * jnp.clip(frac, 0.0, 1.0)

    return schedule


def lr_schedule(policy: str, lr: float, niter: int, niter_decay: int,
                steps_per_epoch: int,
                lr_decay_iters: int = 50) -> Callable[[jax.Array],
                                                      jax.Array]:
    """Family ``--lr_policy`` surface (get_scheduler):

    - ``linear``: the pix2pixHD staircase above (default);
    - ``step``: lr * 0.1^(epoch // lr_decay_iters) (torch StepLR);
    - ``cosine``: 0.5*lr*(1+cos(pi*epoch/niter)) — the family's
      get_scheduler uses CosineAnnealingLR(T_max=opt.n_epochs) i.e. the
      PRE-decay epoch count, and torch's annealing is periodic: a run
      with niter_decay > 0 dips to 0 at epoch=niter and cosine-rises
      back during the decay epochs, exactly as the reference does.

    ``plateau`` is deliberately absent: it conditions on a host-observed
    validation metric, which would split the jitted step; use cosine.
    """
    if policy == "linear":
        return linear_decay_schedule(lr, niter, niter_decay,
                                     steps_per_epoch)

    def epoch_of(step):
        return step // steps_per_epoch  # 0-based

    if policy == "step":
        def schedule(step):
            return lr * jnp.power(0.1, epoch_of(step) // lr_decay_iters)
        return schedule
    if policy == "cosine":
        t_max = max(niter, 1)  # reference T_max excludes decay epochs

        def schedule(step):
            # no clip: CosineAnnealingLR's closed form is periodic
            return 0.5 * lr * (1.0 + jnp.cos(
                jnp.pi * epoch_of(step) / t_max))
        return schedule
    raise ValueError(f"unknown lr_policy: {policy}")


def global_freeze_mask(fix_steps: int) -> Callable[[Any, jax.Array], Any]:
    """Returns gate(grads, step) zeroing global-trunk grads while
    step < fix_steps (coarse-to-fine: the 'enhancer*' groups — and netE
    when feature mode is on — keep training, exactly the param groups
    the reference's optimizer_G holds during niter_fix_global).

    Zeroed grads leave the frozen groups' Adam moments at zero; the
    optimizer's SHARED bias-correction count still advances, so the gate
    alone is NOT equivalent to the reference's optimizer rebuild at
    update_fixed_params — train_step additionally resets the
    ScaleByAdamState at step == fix_steps (see GanModel.fix_steps),
    which together matches the reference's fresh-Adam unfreeze.
    """
    if fix_steps <= 0:
        return lambda grads, step: grads

    def gate(grads: Dict[str, Any], step: jax.Array):
        live = (step >= fix_steps).astype(jnp.float32)

        def mask_group(name, g):
            if name.startswith("global"):
                return jax.tree.map(lambda x: x * live, g)
            return g

        return {k: mask_group(k, v) for k, v in grads.items()}

    return gate
