"""GAN model layer — the L2 rebuild (reference ``models/`` — SURVEY.md §2.2).

``create_model(cfg)`` is the analog of the reference's factory, returning a
``GanModel`` that owns the static architecture/loss configuration and
exposes pure functions:

- ``init_state(key, sample_batch)`` → TrainState (G/D params, optax states,
  step, RNG, image pool);
- ``loss_and_metrics`` → the full conditional-GAN objective;
- ``train_step(state, batch)`` → one fused G+D update (see below);
- ``generate(g_params, a, ...)`` → inference forward.

The fused step (SURVEY.md §3.1 rebuild note, §7 hard-part #6): instead of
the reference's two alternating ``optimizer.step()``s, a single scalar loss

    L = L_G(g_params, sg(d_params)) + L_D(d_params, sg(fake))

is differentiated once w.r.t. ``(g_params, d_params)``. The stop-gradient
walls reproduce the alternating semantics exactly — ``d_params`` gets no
gradient from L_G, the generator none from L_D — while the shared G/D
forwards are computed once and CSE'd by XLA into one compiled program.

Loss vector matches the reference's: [G_GAN, G_GAN_Feat, G_VGG, G_L1,
D_real, D_fake] (SURVEY.md §2.2 pix2pixHD model row).

Temporal mode (BASELINE.json:10): G is conditioned on the previous
generated frame(s) — training scans a short frame window with the carry on
device, t=0 conditioned on zeros (SURVEY.md §2.2 temporal/video model row).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ir2rgb_tpu.config import Config
from ir2rgb_tpu.losses import (
    feature_matching_loss,
    l1_loss,
    vgg_loss,
)
from ir2rgb_tpu.losses.gan import (
    gan_loss_d_parts,
    gan_loss_g,
    gradient_penalty,
)
from ir2rgb_tpu.nn import (
    DiscConfig,
    EncoderConfig,
    GenConfig,
    define_d,
    define_g,
    encoder_apply,
    encoder_init,
    vgg19_init,
)
from ir2rgb_tpu.train.image_pool import PoolState, init_pool, query_pool
from ir2rgb_tpu.train.schedule import (
    global_freeze_mask,
    linear_decay_schedule,
    lr_schedule,
)

Params = Dict[str, Any]


class TrainState(NamedTuple):
    g_params: Params
    d_params: Params
    g_opt: Any
    d_opt: Any
    step: jax.Array        # () int32
    rng: jax.Array         # PRNG key
    pool: PoolState
    # EMA of g_params (train.ema_decay > 0); None when EMA is off, so the
    # pytree leaf structure — and therefore old checkpoints — is unchanged
    # unless the feature is enabled (None children carry no leaves).
    ema_g: Optional[Params] = None


def _dtype_of(name: str):
    return jnp.bfloat16 if name in ("bf16", "bfloat16") else jnp.float32


@dataclasses.dataclass
class GanModel:
    cfg: Config
    gen_cfg: GenConfig
    disc_cfg: DiscConfig
    g_init: Any
    g_apply: Any
    d_init: Any
    d_apply: Any
    vgg_params: Optional[Params]
    g_tx: optax.GradientTransformation
    d_tx: optax.GradientTransformation
    freeze_gate: Any
    steps_per_epoch: int
    # pix2pixHD feature encoder "netE" (None unless use_instance_feat);
    # its params live under g_params["netE"] so the G optimizer covers
    # them, like the reference's optimizer_G = params(G) + params(E)
    enc_cfg: Optional[EncoderConfig] = None
    # coarse-to-fine unfreeze boundary in steps (niter_fix_global *
    # steps_per_epoch); > 0 only for net_g=local. At this step the G
    # Adam moments reset (see train_step) to match the reference's
    # update_fixed_params, which builds a FRESH optimizer.
    fix_steps: int = 0

    # ------------------------------------------------------------------
    # State
    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array, sample_batch: Dict[str, Any]
                   ) -> TrainState:
        kg, kd, krest = jax.random.split(key, 3)
        g_params = self.g_init(kg)
        d_params = self.d_init(kd)
        b = sample_batch["b"]
        frame_shape = tuple(b.shape[-3:])  # (H, W, C) of the target frames
        # the pool stores G outputs, which stay in compute dtype end-to-end
        # (a fp32 round-trip on 512^2 frames costs ~1ms/step of layout
        # copies on TPU — see docs/DESIGN.md train-step profile)
        pool = init_pool(self.cfg.loss.pool_size, frame_shape,
                         dtype=self.gen_cfg.compute_dtype)
        # distinct buffers, not aliases of g_params: the train step donates
        # the whole state, and two fields aliasing one donated buffer is
        # undefined
        ema_g = (jax.tree.map(jnp.array, g_params)
                 if self.cfg.train.ema_decay > 0 else None)
        return TrainState(
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
            rng=krest,
            pool=pool,
            ema_g=ema_g,
        )

    # ------------------------------------------------------------------
    # Forward / generate
    # ------------------------------------------------------------------

    def encode_features(self, g_params: Params, image: jax.Array,
                        inst: Optional[jax.Array] = None) -> jax.Array:
        """netE forward: instance-wise pooled style features of ``image``
        (the reference's Encoder.forward; training encodes the real
        target image)."""
        assert self.enc_cfg is not None
        return encoder_apply(g_params["netE"], image, inst, self.enc_cfg)

    def encode_label(self, a: jax.Array) -> jax.Array:
        """label_nc > 0: (B, H, W, 1) integer class-id map -> one-hot
        (B, H, W, label_nc) in compute dtype, on device (the reference's
        encode_input ``scatter_``). Identity when label_nc == 0 (ir2rgb's
        real-valued IR path). Ids >= label_nc encode to all-zeros rows
        (one_hot's out-of-range semantics), mirroring the reference's
        habit of sizing label_nc to the dataset's id space."""
        label_nc = self.cfg.model.label_nc
        if label_nc <= 0:
            return a
        ids = jnp.round(a[..., 0].astype(jnp.float32)).astype(jnp.int32)
        return jax.nn.one_hot(ids, label_nc,
                              dtype=self.gen_cfg.compute_dtype)

    def generate(self, g_params: Params, a: jax.Array,
                 prev: Optional[jax.Array] = None,
                 train: bool = False,
                 rng: Optional[jax.Array] = None,
                 feat: Optional[jax.Array] = None,
                 edges: Optional[jax.Array] = None) -> jax.Array:
        """Single-frame G forward. In temporal mode ``prev`` is the
        previously generated frame stack (zeros at t=0). With
        use_instance_edges, ``edges`` is the (B, H, W, 1) boundary map;
        with use_instance_feat, ``feat`` is the netE style map (each
        zeros when absent). Channel order matches the reference's
        encode_input/forward: input, edges, feat[, temporal prev].

        With label_nc > 0, ``a`` is a raw (B, H, W, 1) integer label map
        and is one-hot encoded here (the reference encode_input's
        scatter_ oneHot path) before any concatenation.

        Serving forwards (train=False) trace under this model's own
        quantization mode (``cfg.infer.quant``, nn/quant.py) — the mode
        travels with the model instance, so two models with different
        modes coexist in one process. Training forwards always trace in
        mode "none" (round() has zero gradient)."""
        from ir2rgb_tpu.nn import quant
        qm = "none" if train else quant.resolve(self.cfg.infer.quant)
        with quant.using(qm):
            return self._generate(g_params, a, prev, train, rng, feat,
                                  edges)

    def _generate(self, g_params, a, prev, train, rng, feat, edges):
        a = self.encode_label(a)
        if self.cfg.model.use_instance_edges:
            if edges is None:
                edges = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
            a = jnp.concatenate([a, edges.astype(a.dtype)], axis=-1)
        if self.enc_cfg is not None:
            if feat is None:
                feat = jnp.zeros(a.shape[:-1] + (self.enc_cfg.feat_num,),
                                 a.dtype)
            a = jnp.concatenate([a, feat.astype(a.dtype)], axis=-1)
        if self.cfg.model.model == "temporal":
            if prev is None:
                n_prev = self.cfg.model.n_frames_g - 1
                prev = jnp.zeros(a.shape[:-1]
                                 + (self.cfg.model.output_nc * n_prev,),
                                 a.dtype)
            a = jnp.concatenate([a, prev.astype(a.dtype)], axis=-1)
        return self.g_apply(g_params, a, train=train, rng=rng)

    # ------------------------------------------------------------------
    # Losses
    # ------------------------------------------------------------------

    def _frame_losses(self, g_params, d_params, a, b, fake_for_d,
                      fake, k_gp=None) -> Dict[str, jax.Array]:
        """Conditional-GAN losses for one frame batch.

        ``fake`` carries gradients to G; ``fake_for_d`` is the (possibly
        pool-mixed) stop-gradiented fake fed to D's own update."""
        loss_cfg = self.cfg.loss
        sg = jax.lax.stop_gradient
        # D pairs are built in the generator's compute dtype: D casts its
        # input down anyway, and concatenating f32 halves with a bf16 fake
        # would promote the whole 512^2 pair (and its gradient) to f32 —
        # pure layout-copy traffic. Losses still reduce in fp32.
        cdt = fake.dtype
        a_c, b_c = a.astype(cdt), b.astype(cdt)
        pair_real = jnp.concatenate([a_c, b_c], axis=-1)
        pair_fake = jnp.concatenate([a_c, fake], axis=-1)
        pair_fake_d = jnp.concatenate([a_c, fake_for_d.astype(cdt)],
                                      axis=-1)

        # The step needs up to four D pyramid passes: {fake, real} under
        # frozen D weights (G's GAN + FM terms) and {real, sg(fake)} under
        # live D weights (D's own update). Passes sharing params CAN batch
        # along N into one pass (instance norm is per-sample, so slicing
        # the batched outputs reproduces the separate passes exactly —
        # tested), and that halves the 6-channel s2d input conversions.
        # Measured on the v5e it LOSES: 43.2 -> 47.7 ms/step at 512p b1,
        # because doubling N pushes every D conv into XLA's mid-batch
        # (2..7) spatially-split-conv cliff — the same cliff the
        # multistream server pads around (docs/DESIGN.md §6 ladder:
        # batch-2 inference costs 2.9x batch-1). Default OFF; kept as an
        # opt-in (`model._batch_d_pairs = True`) because at batch >= 8,
        # where the cliff is behind, the pass merge is free bandwidth.
        # (Batch norm would mix the halves' statistics — never merged.)
        batch_pairs = (getattr(self, "_batch_d_pairs", False)
                       and self.disc_cfg.norm != "batch")
        nb = pair_fake.shape[0]

        def _split(outs):
            return (jax.tree.map(lambda t: t[:nb], outs),
                    jax.tree.map(lambda t: t[nb:], outs))

        # G side: frozen D weights
        d_params_sg = sg(d_params)
        want_fm = (not loss_cfg.no_gan_feat_loss
                   and self.disc_cfg.get_interm_feat)
        if batch_pairs and want_fm:
            d_out_fake_g, d_out_real_g = _split(self.d_apply(
                d_params_sg,
                jnp.concatenate([pair_fake, pair_real], axis=0)))
        else:
            d_out_fake_g = self.d_apply(d_params_sg, pair_fake)
            d_out_real_g = (self.d_apply(d_params_sg, pair_real)
                            if want_fm else None)
        metrics: Dict[str, jax.Array] = {}
        loss_g = gan_loss_g(d_out_fake_g, loss_cfg.gan_mode)
        metrics["G_GAN"] = loss_g
        if want_fm:
            fm = feature_matching_loss(d_out_fake_g, d_out_real_g,
                                       self.disc_cfg.n_layers)
            fm = fm * loss_cfg.lambda_feat
            metrics["G_GAN_Feat"] = fm
            loss_g = loss_g + fm
        if not loss_cfg.no_vgg_loss and self.vgg_params is not None:
            vgg_dtype = (jnp.bfloat16
                         if self.gen_cfg.compute_dtype == jnp.bfloat16
                         else None)
            vl = vgg_loss(self.vgg_params, fake, b,
                          dtype=vgg_dtype) * loss_cfg.lambda_vgg
            metrics["G_VGG"] = vl
            loss_g = loss_g + vl
        if loss_cfg.lambda_l1 > 0:
            l1 = l1_loss(fake, b) * loss_cfg.lambda_l1
            metrics["G_L1"] = l1
            loss_g = loss_g + l1

        # D side: frozen G output
        if batch_pairs:
            d_out_real, d_out_fake = _split(self.d_apply(
                d_params,
                jnp.concatenate([pair_real, sg(pair_fake_d)], axis=0)))
        else:
            d_out_real = self.d_apply(d_params, pair_real)
            d_out_fake = self.d_apply(d_params, sg(pair_fake_d))
        d_real, d_fake = gan_loss_d_parts(d_out_real, d_out_fake,
                                          loss_cfg.gan_mode)
        metrics["D_real"] = d_real
        metrics["D_fake"] = d_fake
        loss_d = d_real + d_fake
        if loss_cfg.gan_mode == "wgangp":
            # grad-of-grad: the penalty's contribution to ∇d_params is
            # a second derivative through the critic — jax composes it
            # inside the one fused step (torch needs create_graph=True)
            gp = gradient_penalty(
                lambda x: self.d_apply(d_params, x),
                sg(pair_real), sg(pair_fake_d), k_gp,
                loss_cfg.lambda_gp)
            metrics["D_GP"] = gp
            loss_d = loss_d + gp
        metrics["_loss_g"] = loss_g
        metrics["_loss_d"] = loss_d
        return metrics

    def loss_and_metrics(self, g_params: Params, d_params: Params,
                         batch: Dict[str, jax.Array], rng: jax.Array,
                         pool: PoolState
                         ) -> Tuple[jax.Array, Tuple[Dict[str, jax.Array],
                                                     PoolState]]:
        k_drop, k_pool = jax.random.split(rng)
        if self.cfg.model.model == "temporal":
            metrics, pool = self._temporal_losses(g_params, d_params, batch,
                                                  k_drop, k_pool, pool)
        else:
            a, b = batch["a"], batch["b"]
            feat = None
            edges = None
            inst_collisions = None
            if self.cfg.model.use_instance_edges:
                if batch.get("inst") is None:
                    raise ValueError(
                        "use_instance_edges is on but the batch has no "
                        "'inst' maps (<phase>Inst/ folder missing?)")
                from ir2rgb_tpu.nn.encoders import instance_edges
                edges = instance_edges(batch["inst"])
            if self.enc_cfg is not None:
                # reference pix2pixHD feature mode: E encodes the REAL
                # image (instance-pooled) and G conditions on it; E's
                # grads flow through G's losses via feat
                feat = self.encode_features(g_params, b,
                                            batch.get("inst"))
                if batch.get("inst") is not None:
                    # surface hash-segment collisions (distinct raw ids
                    # sharing one pooled style) as a per-batch metric
                    from ir2rgb_tpu.nn.encoders import (
                        instance_collision_count,
                    )
                    inst_collisions = instance_collision_count(
                        batch["inst"], self.enc_cfg.num_instances)
            fake = self.generate(g_params, a, train=True, rng=k_drop,
                                 feat=feat, edges=edges)
            if self.cfg.loss.pool_size > 0:
                fake_for_d, pool = query_pool(
                    pool, jax.lax.stop_gradient(fake), k_pool)
            else:
                fake_for_d = fake
            # D conditions on the encoded label (one-hot when label_nc>0;
            # XLA CSE merges this with generate()'s identical encode) and
            # the edge channel too (reference discriminate() sees
            # input_label = cat(one_hot(label), edges)); the netE feat
            # map stays G-only, as in the reference.
            a_enc = self.encode_label(a)
            a_d = (jnp.concatenate([a_enc, edges.astype(a_enc.dtype)],
                                   axis=-1)
                   if edges is not None else a_enc)
            metrics = self._frame_losses(
                g_params, d_params, a_d, b, fake_for_d, fake,
                k_gp=jax.random.fold_in(k_pool, 1))
            if inst_collisions is not None:
                # stop_gradient: a diagnostic count, not a loss term
                metrics["inst_collisions"] = jax.lax.stop_gradient(
                    inst_collisions.astype(jnp.float32))
        total = metrics["_loss_g"] + metrics["_loss_d"]
        return total, (metrics, pool)

    def _temporal_losses(self, g_params, d_params, batch, k_drop, k_pool,
                         pool):
        """Scan a frame window; G sees cat(IR_t, fake_{t-1}...).

        Fidelity notes (round-1 verdict weak #4): every frame draws its
        OWN dropout key (per-frame `jax.random.split` of ``k_drop`` fed
        through the scan's xs — identical masks across time would
        correlate the temporal noise), and fakes are routed through the
        image pool exactly as the non-temporal path does, with the pool
        state carried through the scan."""
        a_seq = batch["a"]  # (B, T, H, W, Ca)
        b_seq = batch["b"]
        bsz, t_len = a_seq.shape[0], a_seq.shape[1]
        n_prev = self.cfg.model.n_frames_g - 1
        out_nc = self.cfg.model.output_nc
        use_pool = self.cfg.loss.pool_size > 0
        prev0 = jnp.zeros(a_seq.shape[:1] + a_seq.shape[2:4]
                          + (out_nc * n_prev,), self.gen_cfg.compute_dtype)
        sg = jax.lax.stop_gradient

        def step(carry, xs):
            prev, pool = carry
            a_t, b_t, kd, kp = xs
            fake = self.generate(g_params, a_t, prev=prev, train=True,
                                 rng=kd)
            if use_pool:
                fake_for_d, pool = query_pool(pool, sg(fake), kp)
            else:
                fake_for_d = fake
            m = self._frame_losses(g_params, d_params, a_t, b_t,
                                   fake_for_d, fake,
                                   k_gp=jax.random.fold_in(kp, 1))
            new_prev = (jnp.concatenate([fake, prev], axis=-1)[..., :out_nc * n_prev]
                        if n_prev > 0 else prev)
            return (new_prev, pool), m

        a_tm = jnp.moveaxis(a_seq, 1, 0)  # (T, B, ...)
        b_tm = jnp.moveaxis(b_seq, 1, 0)
        drop_keys = jax.random.split(k_drop, t_len)
        pool_keys = jax.random.split(k_pool, t_len)
        (_, pool), metrics_seq = jax.lax.scan(
            step, (prev0, pool), (a_tm, b_tm, drop_keys, pool_keys))
        metrics = jax.tree.map(lambda x: jnp.mean(x), metrics_seq)
        # per-frame G-loss trajectory (aux/debug: filtered from train_step
        # output by the "_" prefix; lets tests verify per-frame RNG keys)
        metrics["_frame_loss_g"] = metrics_seq["_loss_g"]
        return metrics, pool

    # ------------------------------------------------------------------
    # Fused train step
    # ------------------------------------------------------------------

    def train_step(self, state: TrainState, batch: Dict[str, jax.Array]
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, step_rng = jax.random.split(state.rng)

        def grads_at(micro_batch, k, pool):
            def loss_fn(params):
                g_params, d_params = params
                # sg-walls: L_G sees sg(d_params); L_D sees sg(fake)
                return self.loss_and_metrics(g_params, d_params,
                                             micro_batch, k, pool)
            return jax.grad(loss_fn, has_aux=True)(
                (state.g_params, state.d_params))

        accum = max(1, int(self.cfg.train.grad_accum))
        if accum == 1:
            grads, (metrics, pool) = grads_at(batch, step_rng, state.pool)
        else:
            # gradient accumulation: scan `accum` sequential micro-batches
            # (activation memory of batch/accum), sum grads in the carry,
            # ONE optimizer update on the average. All micro-grads are
            # taken at the same params, so with batch-linear losses (every
            # loss here is a batch mean; norm='instance' stats are
            # per-sample) this is numerically the full-batch gradient.
            # The image pool threads through sequentially, seeing each
            # micro-batch's fakes in order. norm='batch' is the one
            # deviation: batch statistics are per-micro-batch, the
            # standard accumulation semantics.
            bsz = int(jax.tree.leaves(batch)[0].shape[0])
            if bsz % accum != 0:
                raise ValueError(
                    f"train.grad_accum={accum} must divide the batch "
                    f"size ({bsz})")

            def to_micro(x):
                return x.reshape((accum, x.shape[0] // accum)
                                 + tuple(x.shape[1:]))

            micro = jax.tree.map(to_micro, batch)
            keys = jax.random.split(step_rng, accum)
            zeros = jax.tree.map(jnp.zeros_like,
                                 (state.g_params, state.d_params))

            def body(carry, xs):
                pool, acc = carry
                mb, k = xs
                g, (m, pool) = grads_at(mb, k, pool)
                return (pool, jax.tree.map(jnp.add, acc, g)), m

            (pool, acc), metrics_seq = jax.lax.scan(
                body, (state.pool, zeros), (micro, keys))
            grads = jax.tree.map(lambda x: x / accum, acc)
            metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0),
                                   metrics_seq)
        g_grads, d_grads = grads
        g_grads = self.freeze_gate(g_grads, state.step)

        g_opt_in = state.g_opt
        if self.fix_steps > 0:
            # reference update_fixed_params: at the unfreeze epoch a
            # FRESH Adam covers the full G — moments AND bias-correction
            # count restart. With the freeze-mask alone, the stale count
            # makes the first unfrozen update ~(1-b1)/sqrt(1-b2) ~ 16x
            # the intended lr on the just-unfrozen trunk. Only the
            # ScaleByAdamState resets; the lr-schedule state (epoch
            # position) is kept, matching the reference's scheduler.
            # Expressed multiplicatively (moments/count times a 0/1
            # gate — tx.init is all-zeros, so gating IS the fresh init)
            # rather than as a lax.cond selecting a fresh tree: a cond
            # result can alias neither branch, so the select introduced
            # a copy of the full Adam state (1.46 GB for the 512p-recipe
            # G trunk) into the step program. Measured A/B on the v5e
            # the win is small — 43.41 -> 43.21 ms/step at 512p b1 (XLA
            # hoisted most of the copy out of the scan body) — but the
            # gate multiply fuses into the Adam update's existing read
            # of mu/nu, so the copy hazard is gone instead of latent.
            keep = (state.step != self.fix_steps)

            def _is_adam(x):
                return isinstance(x, optax.ScaleByAdamState)

            def _reset(o):
                if not _is_adam(o):
                    return o
                gate = keep.astype(jnp.float32)
                return o._replace(
                    count=o.count * keep.astype(o.count.dtype),
                    mu=jax.tree.map(lambda m: m * gate.astype(m.dtype),
                                    o.mu),
                    nu=jax.tree.map(lambda v: v * gate.astype(v.dtype),
                                    o.nu))

            g_opt_in = jax.tree.map(_reset, state.g_opt,
                                    is_leaf=_is_adam)

        g_updates, g_opt = self.g_tx.update(g_grads, g_opt_in,
                                            state.g_params)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)
        ema_g = state.ema_g
        if self.cfg.train.ema_decay > 0 and state.ema_g is not None:
            d = self.cfg.train.ema_decay
            ema_g = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                 state.ema_g, new_g_params)
        new_state = TrainState(
            g_params=new_g_params,
            d_params=optax.apply_updates(state.d_params, d_updates),
            g_opt=g_opt,
            d_opt=d_opt,
            step=state.step + 1,
            rng=rng,
            pool=pool,
            ema_g=ema_g,
        )
        metrics = {k: v for k, v in metrics.items()
                   if not k.startswith("_")}
        return new_state, metrics


# ---------------------------------------------------------------------------
# Factory (reference create_model analog)
# ---------------------------------------------------------------------------

def create_model(cfg: Config, steps_per_epoch: int = 1000,
                 vgg_weights_npz: Optional[str] = None) -> GanModel:
    m = cfg.model
    if m.model == "cycle_gan":
        # unpaired two-generator family — train/cycle.py (shares this
        # class's fused train_step / grad-accum / EMA machinery)
        from ir2rgb_tpu.train.cycle import create_cycle_model
        return create_cycle_model(cfg, steps_per_epoch)
    compute_dtype = _dtype_of(m.compute_dtype)
    n_prev = (m.n_frames_g - 1) if m.model == "temporal" else 0
    # label_nc > 0: G/D consume the one-hot encoded label map instead of
    # a real-valued input image (reference --label_nc semantics)
    base_input_nc = m.label_nc if m.label_nc > 0 else m.input_nc
    if m.label_nc > 0:
        assert m.model != "temporal", \
            "label_nc (semantic-label input) + temporal mode are not " \
            "combined (the reference families keep them separate)"
    g_input_nc = base_input_nc + m.output_nc * n_prev
    d_input_nc = base_input_nc + m.output_nc
    if m.use_instance_edges:
        # reference encode_input: the instance boundary channel rides
        # the label input, so BOTH G and D see it (feat is G-only)
        assert m.model != "temporal", \
            "instance edges + temporal mode are not combined"
        g_input_nc += 1
        d_input_nc += 1
    enc_cfg = None
    if m.use_instance_feat:
        assert m.model != "temporal", \
            "instance features + temporal mode are not combined " \
            "(the reference families keep them separate)"
        enc_cfg = EncoderConfig(
            input_nc=m.output_nc, feat_num=m.feat_num, nef=m.nef,
            n_downsample_e=m.n_downsample_e, norm=m.norm,
            num_instances=m.num_instances,
            compute_dtype=compute_dtype)
        g_input_nc += m.feat_num
    gen_cfg = GenConfig(
        net_g=m.net_g, input_nc=g_input_nc, output_nc=m.output_nc,
        ngf=m.ngf, norm=m.norm, upsample=m.upsample,
        n_downsample_global=m.n_downsample_global,
        n_blocks_global=m.n_blocks_global,
        n_blocks_local=m.n_blocks_local,
        n_local_enhancers=m.n_local_enhancers,
        use_dropout=m.use_dropout,
        compute_dtype=compute_dtype,
        remat=m.remat,
    )
    disc_cfg = DiscConfig(
        net_d=m.net_d, input_nc=d_input_nc, ndf=m.ndf,
        n_layers=m.n_layers_d, num_d=m.num_d, norm=m.norm,
        get_interm_feat=m.get_interm_feat,
        compute_dtype=compute_dtype,
    )
    g_init, g_apply = define_g(gen_cfg)
    d_init, d_apply = define_d(disc_cfg)
    if enc_cfg is not None:
        base_g_init = g_init

        def g_init(key, _base=base_g_init, _ecfg=enc_cfg):
            kg, ke = jax.random.split(key)
            p = _base(kg)
            p["netE"] = encoder_init(ke, _ecfg)
            return p

    if m.init_type != "normal":
        # reference --init_type: post-init weight rewrite, exactly the
        # family's net.apply(init_func) second phase (ops.apply_init_type).
        # Deconv kernels ("up_conv" always; "up" in deconv upsample mode)
        # get torch's ConvTranspose2d fan semantics — fan_in = cout*k*k,
        # orthogonal rows over cin — not the forward-conv fans.
        from ir2rgb_tpu.nn.ops import apply_init_type
        _g0, _d0 = g_init, d_init
        _dp = (("up_conv", "up") if m.upsample == "deconv"
               else ("up_conv",))

        def g_init(key, _base=_g0, _t=m.init_type):
            return apply_init_type(_base(key), jax.random.fold_in(key, 1),
                                   _t, deconv_parents=_dp)

        def d_init(key, _base=_d0, _t=m.init_type):
            return apply_init_type(_base(key), jax.random.fold_in(key, 2),
                                   _t)

    vgg_params = None
    if not cfg.loss.no_vgg_loss:
        npz = vgg_weights_npz or (cfg.loss.vgg_weights or None)
        vgg = vgg19_init(weights_npz=npz)
        if not vgg.pretrained:
            import warnings
            warnings.warn(
                "VGG perceptual loss is running on RANDOM (He-init) "
                "weights — no pretrained VGG19 file was supplied. The "
                "reference's VGGLoss uses ImageNet-pretrained features; "
                "set --loss.vgg_weights to an .npz produced by "
                "`ir2rgb-convert vgg19 <vgg19.pth>` for matching "
                "semantics, or pass --loss.no_vgg_loss true to silence "
                "this.", stacklevel=2)
        vgg_params = vgg.params

    tcfg = cfg.train
    schedule = lr_schedule(tcfg.lr_policy, tcfg.lr, tcfg.niter,
                           tcfg.niter_decay, steps_per_epoch,
                           tcfg.lr_decay_iters)
    mu_dtype = (jnp.bfloat16 if tcfg.adam_mu_dtype in ("bf16", "bfloat16")
                else jnp.float32)
    adam = lambda: optax.adam(learning_rate=schedule, b1=tcfg.beta1,
                              b2=tcfg.beta2, eps=1e-8, mu_dtype=mu_dtype)
    fix_steps = tcfg.niter_fix_global * steps_per_epoch
    freeze_gate = (global_freeze_mask(fix_steps)
                   if m.net_g == "local" else (lambda g, s: g))

    return GanModel(
        cfg=cfg, gen_cfg=gen_cfg, disc_cfg=disc_cfg,
        g_init=g_init, g_apply=g_apply, d_init=d_init, d_apply=d_apply,
        vgg_params=vgg_params, g_tx=adam(), d_tx=adam(),
        freeze_gate=freeze_gate, steps_per_epoch=steps_per_epoch,
        enc_cfg=enc_cfg,
        fix_steps=fix_steps if m.net_g == "local" else 0,
    )
