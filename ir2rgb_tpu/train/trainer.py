"""Training driver — the L5 rebuild of the reference's ``train.py``
(SURVEY.md §3.1), sharding-first.

The reference's inner loop (forward, two optimizer steps, logging,
checkpointing) becomes ONE jitted ``train_step(state, batch)`` compiled
over a data-parallel mesh: batches sharded on the 'data' axis, state
replicated, gradient all-reduce inserted by XLA over ICI
(BASELINE.json:5,11). Buffer donation recycles the parameter/optimizer
memory every step.

Host-side cadence mirrors the reference: ``print_freq`` console/loss-log
lines, ``display_freq`` image dumps, ``save_latest_freq`` step checkpoints
and per-epoch saves (SURVEY.md §3.1 hooks).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ir2rgb_tpu.checkpoint import CheckpointManager
from ir2rgb_tpu.config import Config, save_config
from ir2rgb_tpu.parallel import (
    batch_sharding,
    data_parallel_mesh,
    dp_sp_mesh,
    replicate,
    shard_batch,
)
from ir2rgb_tpu.train.model import GanModel, TrainState


def _partial_merge(dst: Any, src: Any, net: str) -> Any:
    """Reference BaseModel partial-load tolerance: copy every leaf of
    ``src`` whose path exists in ``dst`` with the same shape; keep the
    fresh init elsewhere; log a summary (never raise on tree mismatch).
    Arrays are cast to the destination leaf's dtype."""
    import logging
    log = logging.getLogger(__name__)
    copied, skipped = [], []

    def walk(d, s, prefix):
        if isinstance(d, dict):
            out = {}
            s = s if isinstance(s, dict) else {}
            for k, dv in d.items():
                if k in s:
                    out[k] = walk(dv, s[k], f"{prefix}/{k}")
                else:
                    skipped.append(f"{prefix}/{k} (missing in pretrain)")
                    out[k] = dv
            return out
        # leaf
        if (hasattr(s, "shape") and hasattr(d, "shape")
                and tuple(s.shape) == tuple(d.shape)):
            copied.append(prefix)
            return jnp.asarray(s).astype(d.dtype)
        skipped.append(f"{prefix} (shape {getattr(s, 'shape', None)} vs "
                       f"{getattr(d, 'shape', None)})")
        return d

    out = walk(dst, src, net)
    if skipped:
        log.warning(
            "load_pretrain %s: partial load — %d leaves copied, %d kept "
            "fresh: %s%s", net, len(copied), len(skipped),
            "; ".join(skipped[:8]), " ..." if len(skipped) > 8 else "")
    else:
        log.info("load_pretrain %s: all %d leaves loaded", net,
                 len(copied))
    return out


class Trainer:
    def __init__(self, model: GanModel, cfg: Config,
                 mesh=None, visualizer=None):
        self.model = model
        self.cfg = cfg
        if mesh is not None:
            self.mesh = mesh
        elif cfg.train.spatial_devices > 1:
            self.mesh = dp_sp_mesh(cfg.train.num_devices,
                                   cfg.train.spatial_devices)
        else:
            self.mesh = data_parallel_mesh(cfg.train.num_devices)
        self.visualizer = visualizer
        run_dir = cfg.run_dir()
        os.makedirs(run_dir, exist_ok=True)
        save_config(cfg, os.path.join(run_dir, "config.json"))
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
        if not cfg.train.continue_train:
            # fresh run into an existing dir: reference semantics are
            # overwrite, not crash on the first step collision. Log what
            # is destroyed — a forgotten --continue_train (or a run-name
            # typo onto a finished run) should leave a trace.
            existing = sorted(self.ckpt.all_steps())
            if existing:
                import logging
                logging.getLogger(__name__).warning(
                    "fresh run (no --continue_train) into %s: deleting "
                    "%d existing checkpoint step(s) %s and the epoch "
                    "index — pass --train.continue_train true to resume "
                    "instead", run_dir, len(existing), existing)
            self.ckpt.clear()
        self._last_saved: Optional[int] = None

        self._donate = (0,) if cfg.train.donate else ()
        # the jitted step is built on the first batch: in_shardings must
        # be per-leaf (rank-3 instance maps / rank-1 labels shard the
        # batch axis only — see batch_sharding), and the batch structure
        # isn't known until then. A single rank-4 spec here used to force
        # a reshard copy of every non-image leaf per step on a spatial
        # mesh.
        self._train_step_jit = None
        # display-path forward, compiled once (an unjitted generate on a
        # sharded batch recompiles + runs the slow path every display)
        self._jit_generate = jax.jit(
            lambda p, a: model.generate(p, a, train=False))

        def _gen_cond(p, a, b, inst):
            feat = edges = None
            if model.enc_cfg is not None:
                feat = model.encode_features(p, b, inst)
            if model.cfg.model.use_instance_edges:
                from ir2rgb_tpu.nn.encoders import instance_edges
                edges = instance_edges(inst)
            return model.generate(p, a, train=False, feat=feat,
                                  edges=edges)

        self._jit_generate_cond = jax.jit(_gen_cond)

    # ------------------------------------------------------------------

    def init_or_restore(self, key: jax.Array,
                        sample_batch: Dict[str, Any]) -> TrainState:
        state = self.model.init_state(key, sample_batch)
        if self.cfg.train.load_pretrain:
            # warm-start G/D from another run (reference --load_pretrain):
            # params only — fresh optimizer/step/RNG. The load is PARTIAL
            # and tolerant, like the reference BaseModel's load_network:
            # the flagship coarse-to-fine recipe pretrains a GLOBAL G and
            # warm-starts a LOCAL (enhancer) G from it, so the trees
            # intentionally differ — matching leaves (same path + shape)
            # copy over, everything else keeps its fresh init, and a
            # summary of skipped/missing leaves is logged.
            src = CheckpointManager(
                os.path.join(self.cfg.train.load_pretrain, "ckpt"))
            raw = src.restore()  # template-free: whatever tree is stored
            if not isinstance(raw, dict):
                raw = raw._asdict() if hasattr(raw, "_asdict") else raw
            src_g = raw.get("g_params", {})
            dst_g = state.g_params
            if (isinstance(dst_g, dict) and "global" in dst_g
                    and isinstance(src_g, dict)
                    and "global" not in src_g):
                # the pix2pixHD coarse-to-fine recipe: a pretrained
                # GLOBAL G grafts into the local G's trunk (the
                # reference's load_network matches by name because
                # LocalEnhancer.model IS GlobalGenerator.model; its
                # stripped output head just skips)
                new_g = dict(dst_g)
                new_g["global"] = _partial_merge(dst_g["global"], src_g,
                                                 "G.global")
            else:
                new_g = _partial_merge(dst_g, src_g, "G")
            state = state._replace(
                g_params=new_g,
                d_params=_partial_merge(state.d_params,
                                        raw.get("d_params", {}), "D"))
            if state.ema_g is not None:
                # EMA tracks the warm-started weights, not the discarded
                # fresh init (distinct buffers: the step donates state)
                state = state._replace(
                    ema_g=jax.tree.map(jnp.array, new_g))
        state = jax.device_put(state, replicate(self.mesh))
        if self.cfg.train.continue_train:
            # reference --which_epoch: 'latest' or a named epoch/step
            step = self.ckpt.step_for_label(self.cfg.train.which_epoch)
            if step is not None:
                state = self._restore_tolerant(step, state)
                state = jax.device_put(state, replicate(self.mesh))
                # resuming from a non-latest epoch forks a new trajectory:
                # later checkpoints must go (orbax rejects re-saving an
                # existing step when training reaches it again).
                # delete_after logs the dropped steps loudly; skip the
                # call entirely when resuming from the latest step.
                if any(s > step for s in self.ckpt.all_steps()):
                    self.ckpt.delete_after(step)
        return state

    def _restore_tolerant(self, step: int, state: TrainState) -> TrainState:
        """Restore with the live template; if the stored pool buffer was
        written in a different float dtype (pre-round-2 checkpoints held
        an f32 pool, the template is now compute-dtype), retry with an
        f32-pool template and cast back — old checkpoints stay
        resumable."""
        try:
            return self.ckpt.restore(step, template=state)
        except Exception as e:
            # Only the dtype-mismatch case is retryable; a corrupt
            # checkpoint or genuine tree mismatch must surface its own
            # error, not a misleading second failure from the retry.
            if "dtype" not in str(e).lower():
                raise
            f32_pool = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                state.pool)
            try:
                loaded = self.ckpt.restore(
                    step, template=state._replace(pool=f32_pool))
            except Exception:
                raise e  # the retry didn't apply; report the real cause
            pool = jax.tree.map(lambda x, t: x.astype(t.dtype),
                                loaded.pool, state.pool)
            return loaded._replace(pool=pool)

    def shard(self, batch):
        return shard_batch(batch, self.mesh)

    def _train_step(self, state: TrainState, batch):
        """Jitted fused G+D step, built lazily so in_shardings mirrors
        shard_batch per leaf (images shard rows on 'spatial', lower-rank
        leaves shard the batch axis only)."""
        if self._train_step_jit is None:
            rep = replicate(self.mesh)

            def leaf_sh(x):
                nd = getattr(x, "ndim", 0)
                return batch_sharding(self.mesh, temporal=nd == 5, ndim=nd)

            self._train_step_jit = jax.jit(
                self.model.train_step,
                in_shardings=(rep, jax.tree.map(leaf_sh, batch)),
                out_shardings=(rep, rep),
                donate_argnums=self._donate,
            )
        return self._train_step_jit(state, batch)

    # ------------------------------------------------------------------

    def fit(self, state: TrainState, data: Iterable[Dict[str, Any]],
            total_steps: Optional[int] = None) -> TrainState:
        """Run the epoch/step loop over an iterable of host batches."""
        tcfg = self.cfg.train
        steps_per_epoch = self.model.steps_per_epoch
        if total_steps is None:
            total_steps = (tcfg.niter + tcfg.niter_decay) * steps_per_epoch
        t0 = time.time()
        window = []
        step = int(jax.device_get(state.step))
        for batch in data:
            if step >= total_steps:
                break
            batch = self.shard(batch)
            state, metrics = self._train_step(state, batch)
            step += 1
            window.append(metrics)
            if step % tcfg.print_freq == 0:
                jax.block_until_ready(metrics)
                dt = (time.time() - t0) / max(len(window), 1)
                # ONE batched transfer for the whole window (print_freq x
                # n_metrics individual device_gets = that many host
                # round-trips, a real stall through a remote runtime)
                host_window = jax.device_get(window)
                avg = {k: float(np.mean([m[k] for m in host_window]))
                       for k in host_window[0]}
                epoch = (step - 1) // steps_per_epoch + 1
                if self.visualizer is not None:
                    self.visualizer.print_current_errors(epoch, step, avg, dt)
                window.clear()
                t0 = time.time()
            if (self.visualizer is not None
                    and step % tcfg.display_freq == 0):
                self._display(state, batch, step)
            if step % tcfg.save_latest_freq == 0:
                self._save(step, state)
            if step % steps_per_epoch == 0:
                epoch = step // steps_per_epoch
                if epoch % tcfg.save_epoch_freq == 0:
                    self._save(step, state)
                    self.ckpt.record_epoch(epoch, step)
        # final save — but never re-save a step that already exists on
        # disk (a completed run re-launched with --continue_train breaks
        # on the first batch with _last_saved unset; orbax rejects
        # duplicate steps)
        if step not in set(self.ckpt.all_steps()):
            self._save(step, state, force=True)
        self.ckpt.wait()
        if self.visualizer is not None and hasattr(self.visualizer, "flush"):
            self.visualizer.flush()  # async gallery writes hit disk
        return state

    def _save(self, step: int, state: TrainState,
              force: bool = False) -> None:
        """Save once per step (a step can land on both the save_latest
        and epoch-boundary cadences; orbax rejects duplicate steps)."""
        if step == self._last_saved:
            return
        self.ckpt.save(step, jax.device_get(state), force=force)
        self._last_saved = step

    def _display(self, state: TrainState, batch, step: int) -> None:
        """Reference display_freq hook: dump input/generated/target grids."""
        from ir2rgb_tpu.infer.stream import tensor2im
        a = batch["a"]
        b = batch["b"]
        if a.ndim == 5:  # temporal windows: show the first frame
            a, b = a[:, 0], b[:, 0]
        # only sample 0 is rendered — forward just that row instead of
        # the whole training batch (one extra batch-1 trace, paid once)
        a, b = a[:1], b[:1]
        if "inst" in batch and (self.model.enc_cfg is not None
                                or self.cfg.model.use_instance_edges):
            # conditioned models: display what training actually sees
            # (real-image netE style + edge channel), not the zeros prior
            fake = self._jit_generate_cond(state.g_params, a, b,
                                           batch["inst"][:1])
        else:
            fake = self._jit_generate(state.g_params, a)
        epoch = (step - 1) // self.model.steps_per_epoch + 1
        if self.cfg.model.label_nc > 0:
            from ir2rgb_tpu.infer.stream import label2im
            input_img = label2im(a[:1], self.cfg.model.label_nc)
        else:
            input_img = tensor2im(a[:1])
        # display the batch's first sample (tensor2im keeps B>1 batched)
        self.visualizer.display_current_results(
            {"input": input_img, "generated": tensor2im(fake[:1]),
             "target": tensor2im(b[:1])}, epoch, step)
