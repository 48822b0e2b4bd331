"""Train-dynamics tests (SURVEY.md §4.3): fused step runs, losses behave,
overfit smoke improves PSNR, coarse-to-fine gate freezes the global trunk.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.data.synthetic import synthetic_pair_batch
from ir2rgb_tpu.infer.metrics import psnr
from ir2rgb_tpu.train import create_model


def tiny_cfg(**model_kw):
    defaults = dict(model="pix2pix", net_g="resnet_6blocks",
                    net_d="n_layers", ngf=8, ndf=8, get_interm_feat=True)
    defaults.update(model_kw)
    return Config(
        model=ModelConfig(**defaults),
        data=DataConfig(crop_size=32, batch_size=2),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(niter=1, niter_decay=1),
    )


def _norm_batch(host):
    return {"a": jnp.asarray(host["a"], jnp.float32) / 127.5 - 1.0,
            "b": jnp.asarray(host["b"], jnp.float32) / 127.5 - 1.0}


def test_fused_train_step_runs_and_metrics():
    cfg = tiny_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(model.train_step)
    state, metrics = step(state, batch)
    for k in ("G_GAN", "G_GAN_Feat", "G_L1", "D_real", "D_fake"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1


def test_d_gets_no_gradient_from_g_loss():
    """The sg-wall property: with lambda_l1 only (no GAN), D grads are 0."""
    cfg = tiny_cfg()
    cfg = cfg.replace(loss=LossConfig(no_vgg_loss=True,
                                      no_gan_feat_loss=True))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)

    def g_only_loss(g_params):
        total, _ = model.loss_and_metrics(g_params, state.d_params, batch,
                                          jax.random.PRNGKey(1), state.pool)
        return total

    def d_from_g(d_params):
        # gradient of the *generator* losses w.r.t. d_params must be zero
        sg = jax.lax.stop_gradient
        _, (m, _) = model.loss_and_metrics(state.g_params, d_params, batch,
                                           jax.random.PRNGKey(1), state.pool)
        return m["G_GAN"] + m.get("G_GAN_Feat", 0.0) + m.get("G_L1", 0.0)

    d_grads = jax.grad(d_from_g)(state.d_params)
    leaves = jax.tree.leaves(d_grads)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)


def test_overfit_smoke_psnr_improves():
    """50 steps on a fixed pair: G loss down, output PSNR up."""
    cfg = tiny_cfg()
    model = create_model(cfg, steps_per_epoch=1000)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(model.train_step, donate_argnums=(0,))

    fake0 = model.generate(state.g_params, batch["a"], train=False)
    psnr0 = float(psnr(fake0, batch["b"]))
    for _ in range(50):
        state, metrics = step(state, batch)
    fake1 = model.generate(state.g_params, batch["a"], train=False)
    psnr1 = float(psnr(fake1, batch["b"]))
    assert psnr1 > psnr0 + 1.0, (psnr0, psnr1)


def test_temporal_train_step():
    cfg = tiny_cfg(model="temporal", net_d="multiscale", num_d=2,
                   n_frames_g=2)
    model = create_model(cfg, steps_per_epoch=10)
    a = np.random.RandomState(0).rand(2, 3, 32, 32, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(2, 3, 32, 32, 3).astype(np.float32)
    batch = {"a": jnp.asarray(a) * 2 - 1, "b": jnp.asarray(b) * 2 - 1}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    assert int(state.step) == 1


def test_coarse_to_fine_freeze():
    """With niter_fix_global set, global-trunk params must not move while
    enhancer params do."""
    cfg = Config(
        model=ModelConfig(model="pix2pixhd", net_g="local",
                          net_d="multiscale", ngf=4, ndf=8, num_d=2,
                          n_downsample_global=2, n_blocks_global=1,
                          n_blocks_local=1),
        data=DataConfig(crop_size=32, batch_size=1),
        loss=LossConfig(no_vgg_loss=True, lambda_l1=10.0),
        train=TrainConfig(niter_fix_global=1),
    )
    model = create_model(cfg, steps_per_epoch=100)  # fix for 100 steps
    batch = _norm_batch(synthetic_pair_batch(1, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    g0 = jax.device_get(state.g_params)
    state, _ = jax.jit(model.train_step)(state, batch)
    g1 = jax.device_get(state.g_params)
    diff_global = max(float(np.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(g0["global"]), jax.tree.leaves(g1["global"])))
    diff_enh = max(float(np.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(g0["enhancer1"]), jax.tree.leaves(g1["enhancer1"])))
    assert diff_global == 0.0
    assert diff_enh > 0.0


def test_lr_schedule_linear_decay():
    from ir2rgb_tpu.train.schedule import linear_decay_schedule
    sched = linear_decay_schedule(2e-4, niter=2, niter_decay=4,
                                  steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(19)) == pytest.approx(2e-4)   # last const epoch
    # reference staircase: lr -= lr0/niter_decay at the END of each epoch
    # past niter, so epoch 2 (first decay epoch) still trains at lr0 and
    # epochs 3..5 at 3/4, 2/4, 1/4 of lr0.
    assert float(sched(20)) == pytest.approx(2e-4)
    assert float(sched(30)) == pytest.approx(2e-4 * 3 / 4)
    assert float(sched(59)) == pytest.approx(2e-4 * 1 / 4, rel=1e-5)


def test_image_pool_semantics():
    from ir2rgb_tpu.train.image_pool import init_pool, query_pool
    pool = init_pool(4, (8, 8, 3))
    fakes = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    out, pool = query_pool(pool, fakes, jax.random.PRNGKey(0))
    # pool not full: passthrough + insert
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fakes))
    assert int(pool.count) == 2
    # fill up
    out, pool = query_pool(pool, fakes + 100, jax.random.PRNGKey(1))
    assert int(pool.count) == 4
    # now full: queries may swap; count stays
    out, pool = query_pool(pool, fakes + 200, jax.random.PRNGKey(2))
    assert int(pool.count) == 4


def _temporal_batch(t=3, identical_frames=False):
    r = np.random.RandomState(0)
    a = r.rand(2, t, 32, 32, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(2, t, 32, 32, 3).astype(np.float32)
    if identical_frames:
        a = np.repeat(a[:, :1], t, axis=1)
        b = np.repeat(b[:, :1], t, axis=1)
    return {"a": jnp.asarray(a) * 2 - 1, "b": jnp.asarray(b) * 2 - 1}


def test_temporal_n_frames_g3():
    """Three-frame conditioning window (round-1 verdict item #5)."""
    cfg = tiny_cfg(model="temporal", net_d="multiscale", num_d=2,
                   n_frames_g=3)
    model = create_model(cfg, steps_per_epoch=10)
    batch = _temporal_batch(t=4)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    for k in ("G_GAN", "D_real", "D_fake"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1


def test_temporal_routes_fakes_through_pool():
    """Temporal mode must pool-mix fakes like the frame path does: after
    one step over a (B=2, T=3) window the pool holds all 6 fakes."""
    cfg = tiny_cfg(model="temporal", net_d="multiscale", num_d=2,
                   n_frames_g=2)
    cfg = cfg.replace(loss=LossConfig(no_vgg_loss=True, pool_size=50))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _temporal_batch(t=3)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    assert int(state.pool.count) == 0
    state, _ = jax.jit(model.train_step)(state, batch)
    assert int(state.pool.count) == 6


def test_temporal_per_frame_dropout_keys():
    """Each frame of the scan must draw its own dropout mask: with
    identical frames and no prev-conditioning (n_frames_g=1), per-frame
    G losses differ iff the dropout keys differ across time."""
    def frame_losses(use_dropout):
        cfg = tiny_cfg(model="temporal", net_d="multiscale", num_d=2,
                       n_frames_g=1, use_dropout=use_dropout)
        model = create_model(cfg, steps_per_epoch=10)
        batch = _temporal_batch(t=3, identical_frames=True)
        state = model.init_state(jax.random.PRNGKey(0), batch)
        _, (m, _) = model.loss_and_metrics(
            state.g_params, state.d_params, batch,
            jax.random.PRNGKey(7), state.pool)
        return np.asarray(m["_frame_loss_g"])

    with_drop = frame_losses(True)
    without = frame_losses(False)
    # control: identical inputs + no dropout -> identical per-frame losses
    assert np.allclose(without, without[0], rtol=1e-6)
    # per-frame keys: dropout makes each frame's loss distinct
    assert not np.allclose(with_drop, with_drop[0], rtol=1e-6)
    assert len(np.unique(np.round(with_drop, 7))) == 3, with_drop


def test_temporal_local_enhancer_3scale_d_train_step():
    """The temporal_1024 preset's combination — temporal model x local
    enhancer G x 3-scale multiscale D — builds and steps (shrunk)."""
    cfg = tiny_cfg(model="temporal", net_g="local", net_d="multiscale",
                   num_d=3, n_frames_g=2, n_downsample_global=2,
                   n_blocks_global=1, n_blocks_local=1)
    model = create_model(cfg, steps_per_epoch=10)
    a = np.random.RandomState(0).rand(1, 3, 64, 64, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(1, 3, 64, 64, 3).astype(np.float32)
    batch = {"a": jnp.asarray(a) * 2 - 1, "b": jnp.asarray(b) * 2 - 1}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    assert int(state.step) == 1


def test_lr_policies():
    """--lr_policy step/cosine (family get_scheduler semantics)."""
    from ir2rgb_tpu.train.schedule import lr_schedule

    step_sched = lr_schedule("step", 2e-4, niter=4, niter_decay=0,
                             steps_per_epoch=10, lr_decay_iters=2)
    assert float(step_sched(0)) == pytest.approx(2e-4)
    assert float(step_sched(19)) == pytest.approx(2e-4)     # epoch 1
    assert float(step_sched(20)) == pytest.approx(2e-5)     # epoch 2
    assert float(step_sched(40)) == pytest.approx(2e-6)     # epoch 4

    # reference T_max = niter (pre-decay count); CosineAnnealingLR is
    # periodic, so with niter_decay the lr dips to 0 at epoch=niter and
    # cosine-rises back during the decay epochs (family quirk, matched)
    cos = lr_schedule("cosine", 1e-3, niter=5, niter_decay=5,
                      steps_per_epoch=10)
    import math
    assert float(cos(0)) == pytest.approx(1e-3)
    # epoch 2: 0.5*lr*(1+cos(2pi/5))
    assert float(cos(25)) == pytest.approx(
        5e-4 * (1 + math.cos(2 * math.pi / 5)), rel=1e-5)
    assert float(cos(50)) == pytest.approx(0.0, abs=1e-10)  # epoch 5 = T_max
    # epoch 7: risen back above the minimum (periodic annealing)
    assert float(cos(75)) == pytest.approx(
        5e-4 * (1 + math.cos(7 * math.pi / 5)), rel=1e-5)
    assert float(cos(75)) > 1e-4
    assert float(cos(100)) == pytest.approx(1e-3, rel=1e-5)  # epoch 10

    with pytest.raises(ValueError, match="lr_policy"):
        lr_schedule("plateau", 1e-3, 1, 1, 10)

    # linear passthrough equals the staircase schedule
    lin = lr_schedule("linear", 2e-4, niter=2, niter_decay=4,
                      steps_per_epoch=10)
    assert float(lin(30)) == pytest.approx(2e-4 * 3 / 4)


def test_init_types():
    """--init_type rewrites conv kernels with the right statistics and
    leaves biases/norms alone; orthogonal rows are orthonormal."""
    from ir2rgb_tpu.nn.generators import GenConfig, define_g
    from ir2rgb_tpu.nn.ops import apply_init_type

    cfg = GenConfig(net_g="resnet_6blocks", ngf=16, norm="instance")
    init, _ = define_g(cfg)
    base = init(jax.random.PRNGKey(0))

    same = apply_init_type(base, jax.random.PRNGKey(1), "normal")
    assert same is base  # no-op path

    for t in ("xavier", "kaiming", "orthogonal"):
        p = apply_init_type(base, jax.random.PRNGKey(1), t)
        w0 = np.asarray(base["head"]["conv"]["w"])
        w1 = np.asarray(p["head"]["conv"]["w"])
        assert w0.shape == w1.shape and not np.allclose(w0, w1), t
        np.testing.assert_array_equal(
            np.asarray(p["head"]["conv"]["b"]),
            np.asarray(base["head"]["conv"]["b"]))
        # deterministic given the key
        p2 = apply_init_type(base, jax.random.PRNGKey(1), t)
        np.testing.assert_array_equal(w1, np.asarray(
            p2["head"]["conv"]["w"]))

    # kaiming std ~ sqrt(2/fan_in) on a big kernel
    pk = apply_init_type(base, jax.random.PRNGKey(2), "kaiming")
    w = np.asarray(pk["down0"]["conv"]["w"])  # (3,3,16,32)
    fan_in = w.shape[0] * w.shape[1] * w.shape[2]
    assert np.std(w) == pytest.approx((2.0 / fan_in) ** 0.5, rel=0.1)

    # orthogonal: flattened (cout, fan_in) rows orthonormal (cout<fan_in)
    po = apply_init_type(base, jax.random.PRNGKey(3), "orthogonal")
    w = np.asarray(po["down0"]["conv"]["w"], np.float64) / 0.02
    mat = w.transpose(3, 0, 1, 2).reshape(w.shape[3], -1)
    np.testing.assert_allclose(mat @ mat.T, np.eye(mat.shape[0]),
                               atol=1e-4)

    # deconv kernels get torch's ConvTranspose2d fans (fan_in = cout*k*k,
    # orthogonal rows over cin), NOT the forward-conv fans — the up
    # layers' (3,3,cin=2c,cout=c) HWIO kernels would otherwise draw a
    # sqrt(2)-off kaiming std vs the reference init_func
    pk = apply_init_type(base, jax.random.PRNGKey(2), "kaiming",
                         deconv_parents=("up",))
    w = np.asarray(pk["up0"]["up"]["w"])  # (3,3,cin,cout) with cin=2*cout
    fan_in_t = w.shape[0] * w.shape[1] * w.shape[3]  # cout*k*k
    assert np.std(w) == pytest.approx((2.0 / fan_in_t) ** 0.5, rel=0.1)
    # non-deconv leaves are unaffected by the flag
    np.testing.assert_array_equal(
        np.asarray(pk["down0"]["conv"]["w"]),
        np.asarray(apply_init_type(base, jax.random.PRNGKey(2),
                                   "kaiming")["down0"]["conv"]["w"]))
    po = apply_init_type(base, jax.random.PRNGKey(3), "orthogonal",
                         deconv_parents=("up",))
    w = np.asarray(po["up0"]["up"]["w"], np.float64) / 0.02
    # rows indexed by cin (torch flattens ConvTranspose2d weight to
    # (cin, cout*k*k)); cin < cout*k*k here -> rows orthonormal
    mat = w.transpose(2, 0, 1, 3).reshape(w.shape[2], -1)
    np.testing.assert_allclose(mat @ mat.T, np.eye(mat.shape[0]),
                               atol=1e-4)


def test_train_step_with_init_type_and_lr_policy_and_pixel_d():
    """The three family knobs compose: xavier init, cosine lr, pixel D."""
    import dataclasses

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS["pix2pix_unet256"]
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, net_g="resnet_6blocks", ngf=8, ndf=8,
            net_d="pixel", init_type="xavier"),
        train=dataclasses.replace(cfg.train, lr_policy="cosine"))
    model = create_model(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(0)
    batch = {"a": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
             "b": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    assert np.isfinite(float(metrics["D_real"]))


def test_adam_reset_at_unfreeze_boundary():
    """At step == niter_fix_global*steps_per_epoch the G optimizer's
    ScaleByAdamState resets (the reference's update_fixed_params builds a
    FRESH Adam) — without it the stale shared bias-correction count makes
    the first unfrozen update ~(1-b1)/sqrt(1-b2) ~ 16x lr."""
    import optax

    cfg = Config(
        model=ModelConfig(model="pix2pixhd", net_g="local", ngf=4, ndf=4,
                          n_downsample_global=2, n_blocks_global=1,
                          n_blocks_local=1),
        data=DataConfig(crop_size=32, batch_size=2),
        loss=LossConfig(no_vgg_loss=True, pool_size=0),
        train=TrainConfig(niter=2, niter_decay=0, niter_fix_global=1),
    )
    model = create_model(cfg, steps_per_epoch=2)
    assert model.fix_steps == 2
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(model.train_step)

    def adam_count(opt_state):
        # find the ScaleByAdamState count
        def find(o):
            if isinstance(o, optax.ScaleByAdamState):
                return int(jax.device_get(o.count))
            if isinstance(o, (tuple, list)):
                for c in o:
                    r = find(c)
                    if r is not None:
                        return r
            return None
        return find(opt_state)

    state, _ = step(state, batch)   # step 0 -> 1 (frozen)
    state, _ = step(state, batch)   # step 1 -> 2 (frozen)
    assert adam_count(state.g_opt) == 2
    state, _ = step(state, batch)   # step 2 == fix_steps: RESET then update
    assert adam_count(state.g_opt) == 1, \
        "Adam count must restart at the unfreeze boundary"
    state, _ = step(state, batch)
    assert adam_count(state.g_opt) == 2


def test_query_pool_placeholder_raises():
    """init_pool(0)'s placeholder must not be scannable — callers gate on
    cfg.loss.pool_size, and a missed gate should fail with the real
    cause, not a broadcast error."""
    from ir2rgb_tpu.train.image_pool import init_pool, query_pool
    pool = init_pool(0, (8, 8, 3))
    fakes = jnp.zeros((2, 8, 8, 3))
    with pytest.raises(ValueError, match="disabled-pool"):
        query_pool(pool, fakes, jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# Gradient accumulation + EMA (framework extensions; docs/COMPONENTS.md)
# ---------------------------------------------------------------------------

def test_grad_accum_matches_full_batch():
    """grad_accum=K on one batch == the plain full-batch step: every loss
    is a batch mean and instance-norm stats are per-sample, so the mean of
    the K micro-gradients (taken at the same params) IS the full-batch
    gradient — the resulting params must match to fp tolerance."""
    cfg = tiny_cfg()
    cfg4 = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=4))
    cfg_acc = cfg4.replace(train=dataclasses.replace(cfg4.train,
                                                     grad_accum=2))
    import optax
    batch = _norm_batch(synthetic_pair_batch(4, 32))
    model_full = create_model(cfg4, steps_per_epoch=10)
    model_acc = create_model(cfg_acc, steps_per_epoch=10)
    # SGD(1.0) instead of Adam so old - new == the raw gradient: Adam's
    # first update is ~ sign(g)*lr, which flips under fp noise wherever a
    # gradient element is near zero — params after Adam are an
    # ill-conditioned equality probe, the gradients themselves are not.
    for m in (model_full, model_acc):
        m.g_tx = optax.sgd(1.0)
        m.d_tx = optax.sgd(1.0)
    state_full = model_full.init_state(jax.random.PRNGKey(0), batch)
    state_acc = model_acc.init_state(jax.random.PRNGKey(0), batch)
    new_full, m_full = jax.jit(model_full.train_step)(state_full, batch)
    new_acc, m_acc = jax.jit(model_acc.train_step)(state_acc, batch)
    for k in m_full:
        np.testing.assert_allclose(float(m_acc[k]), float(m_full[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)

    def grads(old, new):
        return jax.tree.map(lambda o, n: np.asarray(o - n),
                            (old.g_params, old.d_params),
                            (new.g_params, new.d_params))

    for gf, ga in zip(jax.tree.leaves(grads(state_full, new_full)),
                      jax.tree.leaves(grads(state_acc, new_acc))):
        # atol 2e-5: bias grads are near-cancelling sums of O(1) terms, so
        # their fp32 noise floor is ~1e-6 absolute however small the grad;
        # scale/splitting bugs still trip rtol on the large-grad leaves
        np.testing.assert_allclose(ga, gf, rtol=1e-3, atol=2e-5)


def test_grad_accum_indivisible_raises():
    cfg = tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, grad_accum=2),
                      data=dataclasses.replace(cfg.data, batch_size=3))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(3, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="grad_accum"):
        jax.jit(model.train_step)(state, batch)


def test_grad_accum_pool_sees_every_micro_batch():
    """The image pool threads through the micro-batch scan: after one
    accumulated step on batch 4, all 4 fakes entered the pool."""
    cfg = tiny_cfg()
    cfg = cfg.replace(
        loss=LossConfig(no_vgg_loss=True, pool_size=8),
        train=dataclasses.replace(cfg.train, grad_accum=2),
        data=dataclasses.replace(cfg.data, batch_size=4))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(4, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(model.train_step)(state, batch)
    assert int(state.pool.count) == 4


def test_grad_accum_temporal_smoke():
    cfg = Config(
        model=ModelConfig(model="temporal", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=8, ndf=8, n_frames_g=2),
        data=DataConfig(dataset_mode="temporal", crop_size=32,
                        batch_size=2, n_frames_total=3),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(niter=1, niter_decay=1, grad_accum=2),
    )
    model = create_model(cfg, steps_per_epoch=10)
    a = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32, 3),
                    jnp.float32) * 2 - 1
    b = jnp.asarray(np.random.RandomState(1).rand(2, 3, 32, 32, 3),
                    jnp.float32) * 2 - 1
    batch = {"a": a, "b": b}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    assert int(state.step) == 1


def test_ema_tracks_generator():
    """ema_decay > 0: state carries an EMA copy updated as
    d*ema + (1-d)*params every step; decay 0 keeps the field None (old
    checkpoint layout)."""
    cfg = tiny_cfg()
    assert create_model(cfg, steps_per_epoch=10).init_state(
        jax.random.PRNGKey(0),
        _norm_batch(synthetic_pair_batch(2, 32))).ema_g is None

    cfg = cfg.replace(train=dataclasses.replace(cfg.train, ema_decay=0.5))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state0 = model.init_state(jax.random.PRNGKey(0), batch)
    # at init the EMA equals the params (distinct buffers)
    for e, p in zip(jax.tree.leaves(state0.ema_g),
                    jax.tree.leaves(state0.g_params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    state1, _ = jax.jit(model.train_step)(state0, batch)
    expect = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p,
                          state0.ema_g, state1.g_params)
    for e, x in zip(jax.tree.leaves(state1.ema_g),
                    jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(x),
                                   rtol=1e-6, atol=1e-7)
    # the EMA lags the raw params after a step
    diffs = [float(jnp.abs(e - p).max())
             for e, p in zip(jax.tree.leaves(state1.ema_g),
                             jax.tree.leaves(state1.g_params))]
    assert max(diffs) > 0.0


def test_batched_d_pairs_match_separate_passes():
    """The four per-step D pyramid passes batch into two batch-2N passes
    (fake+real under frozen D, real+sg(fake) under live D). Instance norm
    is per-sample, so the batched step must reproduce the separate-pass
    losses and gradients exactly (same ops per sample, f32 on CPU)."""
    cfg = tiny_cfg(net_d="multiscale", num_d=2)
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)

    def run(batched):
        model._batch_d_pairs = batched
        try:
            def loss(g_params, d_params):
                total, (m, _) = model.loss_and_metrics(
                    g_params, d_params, batch, jax.random.PRNGKey(1),
                    state.pool)
                return total, m
            (total, m), grads = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(
                    state.g_params, state.d_params)
            return total, m, grads
        finally:
            del model._batch_d_pairs

    t_b, m_b, g_b = run(True)
    t_s, m_s, g_s = run(False)
    np.testing.assert_allclose(float(t_b), float(t_s), rtol=1e-6)
    for k in ("G_GAN", "G_GAN_Feat", "D_real", "D_fake"):
        np.testing.assert_allclose(float(m_b[k]), float(m_s[k]), rtol=1e-6,
                                   err_msg=k)
    for leaf_b, leaf_s in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(leaf_b), np.asarray(leaf_s),
                                   rtol=1e-5, atol=1e-7)


def test_batch_norm_d_never_merges_passes():
    """Batch-norm D mixes batch statistics across samples, so the
    fake/real halves must NOT share one batched pass even when the
    opt-in flag is set: losses must equal the separate-pass run."""
    cfg = tiny_cfg(norm="batch")
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)

    def total(flag):
        if flag is not None:
            model._batch_d_pairs = flag
        try:
            t, _ = model.loss_and_metrics(state.g_params, state.d_params,
                                          batch, jax.random.PRNGKey(1),
                                          state.pool)
            return float(t)
        finally:
            if flag is not None:
                del model._batch_d_pairs
    np.testing.assert_allclose(total(True), total(None), rtol=1e-6)


def test_adam_mu_dtype_bf16():
    """--train.adam_mu_dtype bf16 stores Adam's first moment in bfloat16
    (optax mu_dtype) — the update runs, moments are bf16, nu stays f32,
    and the unfreeze-boundary moment reset still composes."""
    import optax

    cfg = tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                adam_mu_dtype="bf16"))
    model = create_model(cfg, steps_per_epoch=10)
    batch = _norm_batch(synthetic_pair_batch(2, 32))
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))

    adam_states = [s for s in jax.tree.leaves(
        state.g_opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states
    for s in adam_states:
        for m in jax.tree.leaves(s.mu):
            assert m.dtype == jnp.bfloat16, m.dtype
        for v in jax.tree.leaves(s.nu):
            assert v.dtype == jnp.float32, v.dtype
