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

import json
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
            # epoch-labeled steps are pinned: the reference keeps every
            # <epoch>_net_G.pth forever, so which_epoch=N must stay
            # restorable — without this, retention GC'd labeled steps
            # while epochs.json kept their labels (dangling labels)
            should_keep_fn=self._is_labeled_step,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=opts)

    def _is_labeled_step(self, step: int) -> bool:
        path = self._epochs_path()
        if not os.path.exists(path):
            return False
        try:
            with open(path) as fh:
                return int(step) in {int(s) for s in json.load(fh).values()}
        except Exception:
            return False

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

    def delete_after(self, step: int) -> None:
        """Drop checkpoints (and epoch labels) newer than ``step`` —
        resuming from a non-latest epoch starts a NEW trajectory, and
        orbax rejects re-saving a step that already exists. The dropped
        steps are logged loudly first: an accidental --which_epoch typo
        otherwise destroys later training history with no trace."""
        newer = [s for s in self._mgr.all_steps() if s > step]
        if newer:
            import logging
            logging.getLogger(__name__).warning(
                "checkpoint: resuming from step %d FORKS the run — "
                "permanently deleting %d newer checkpoint(s) %s from %s",
                step, len(newer), sorted(newer), self._dir)
        for s in newer:
            self._mgr.delete(s)
        path = self._epochs_path()
        if os.path.exists(path):
            with open(path) as fh:
                m = json.load(fh)
            m = {e: s for e, s in m.items() if int(s) <= step}
            with open(path, "w") as fh:
                json.dump(m, fh, indent=0, sort_keys=True)

    def clear(self) -> None:
        """Delete every managed step + the epoch index — fresh-run
        semantics (the reference overwrites its ``*_net_G.pth`` files in
        place; a non-continue run must not collide with a previous run's
        steps)."""
        for s in list(self._mgr.all_steps()):
            self._mgr.delete(s)
        if os.path.exists(self._epochs_path()):
            os.remove(self._epochs_path())

    # -- epoch labels (reference --which_epoch) -------------------------

    def _epochs_path(self) -> str:
        return os.path.join(self._dir, "epochs.json")

    def record_epoch(self, epoch: int, step: int) -> None:
        """Remember that ``step`` is the end of ``epoch`` (written at
        epoch-boundary saves so infer/resume can address checkpoints by
        the reference's epoch labels)."""
        m = {}
        if os.path.exists(self._epochs_path()):
            with open(self._epochs_path()) as fh:
                m = json.load(fh)
        m[str(epoch)] = int(step)
        with open(self._epochs_path(), "w") as fh:
            json.dump(m, fh, indent=0, sort_keys=True)

    def step_for_label(self, label: str) -> Optional[int]:
        """Resolve a reference-style ``which_epoch`` label ('latest' or an
        epoch number) to a saved step. Returns None for 'latest' with no
        checkpoints; raises for a named epoch that was never saved."""
        if label in ("latest", "", None):
            return self._mgr.latest_step()
        m = {}
        if os.path.exists(self._epochs_path()):
            with open(self._epochs_path()) as fh:
                m = json.load(fh)
        if str(label) in m:
            return int(m[str(label)])
        # fall back: a bare step number that exists is accepted directly
        try:
            step = int(label)
        except ValueError:
            step = None
        if step is not None and step in set(self._mgr.all_steps()):
            return step
        raise FileNotFoundError(
            f"which_epoch={label!r} not found in {self._dir}; "
            f"epochs recorded: {sorted(m)}; steps: "
            f"{sorted(self._mgr.all_steps())}")

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
