"""Orbax-based checkpointing.

Replaces the reference's per-net ``torch.save`` files
(``<epoch>_net_G.pth`` / ``latest_net_G.pth`` + tolerant partial load —
SURVEY.md §3.4) with a single Orbax-managed pytree per step containing
G/D params, optimizer states, step counter, and RNG key, with async saves
and retention (SURVEY.md §5 "failure detection": restart loses at most one
save interval; resume restores everything including RNG).

Labels mirror the reference: numeric epochs plus a rolling "latest".
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with reference-style
    labels ('latest' handled by step bookkeeping)."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = True):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=opts)

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_train_state(directory: str, step: int, state: Any) -> None:
    """One-shot synchronous save (no retention management)."""
    path = os.path.join(os.path.abspath(directory), str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_train_state(directory: str, step: int,
                        template: Optional[Any] = None) -> Any:
    path = os.path.join(os.path.abspath(directory), str(step))
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
