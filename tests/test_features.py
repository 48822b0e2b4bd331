"""Test-time feature control (infer/features.py — the pix2pixHD
encode_features / cluster / sample workflow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ir2rgb_tpu.infer.features import (
    kmeans,
    load_clusters,
    sample_feature_map,
    save_clusters,
)
from ir2rgb_tpu.nn.encoders import (
    hash_instance_ids,
    instance_feature_table,
    instance_wise_avg_pool,
)


def test_feature_table_backs_pooling():
    """The table form must agree with the broadcast pooled map."""
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    inst = jnp.asarray(rng.randint(0, 5, (2, 8, 8)))
    pooled = instance_wise_avg_pool(feat, inst, num_instances=64)
    means, cnts, ids = instance_feature_table(feat, inst, num_instances=64)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(
            hash_instance_ids(np.asarray(inst).reshape(2, -1), 64)))
    gathered = jax.vmap(lambda m, i: m[i])(means, ids).reshape(2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(gathered),
                               rtol=1e-6)
    # populated segment count == distinct hashed ids
    assert int((cnts[0] > 0).sum()) == len(np.unique(np.asarray(ids[0])))


def test_kmeans_recovers_blobs():
    rng = np.random.RandomState(1)
    blobs = np.concatenate([
        rng.randn(50, 3) * 0.01 + c
        for c in ([0, 0, 0], [5, 5, 5], [-5, 0, 5])])
    centers = kmeans(blobs, k=3, seed=0)
    assert centers.shape == (3, 3)
    # every true blob center is ~a recovered center
    for c in ([0, 0, 0], [5, 5, 5], [-5, 0, 5]):
        d = np.min(np.linalg.norm(centers - np.asarray(c), axis=1))
        assert d < 0.1, (c, centers)


def test_kmeans_degenerate_fewer_points_than_k():
    x = np.ones((3, 2), np.float32)
    centers = kmeans(x, k=10)
    assert len(centers) <= 3
    np.testing.assert_allclose(centers[0], [1, 1])


def test_sample_feature_map_instance_consistent():
    """Every pixel of an instance gets the SAME sampled centroid, and
    each centroid comes from the table."""
    centers = np.asarray([[0., 0.], [1., 1.], [2., 2.], [3., 3.]],
                         np.float32)
    inst = np.zeros((1, 16, 16), np.int32)
    inst[0, :8] = 7
    inst[0, 8:] = 42
    feat = np.asarray(sample_feature_map(
        jnp.asarray(inst), jnp.asarray(centers), jax.random.PRNGKey(0),
        num_instances=256))
    top = feat[0, :8].reshape(-1, 2)
    bot = feat[0, 8:].reshape(-1, 2)
    assert (top == top[0]).all() and (bot == bot[0]).all()
    for v in (top[0], bot[0]):
        assert any(np.allclose(v, c) for c in centers)


def test_sample_feature_map_varies_with_key():
    centers = np.arange(20, dtype=np.float32).reshape(10, 2)
    inst = np.arange(64, dtype=np.int32).reshape(1, 8, 8)  # 64 instances
    a = np.asarray(sample_feature_map(jnp.asarray(inst), centers,
                                      jax.random.PRNGKey(0)))
    b = np.asarray(sample_feature_map(jnp.asarray(inst), centers,
                                      jax.random.PRNGKey(1)))
    assert not np.allclose(a, b)


def test_cluster_save_load_roundtrip(tmp_path):
    centers = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    p = str(tmp_path / "feats.npz")
    save_clusters(p, centers)
    np.testing.assert_array_equal(load_clusters(p), centers)


def test_streaming_generator_feat_path():
    """push_device(feat=...) must reach the generator: different feats,
    different outputs; temporal mode rejects feat."""
    import dataclasses

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.infer import StreamingGenerator
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS["pix2pixhd_512"]
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, ngf=4, ndf=4, n_downsample_global=2, n_blocks_global=1,
        n_blocks_local=1, use_instance_feat=True, nef=4, n_downsample_e=2,
        feat_num=3))
    model = create_model(cfg, steps_per_epoch=10)
    g = model.g_init(jax.random.PRNGKey(0))
    stream = StreamingGenerator(model, g, (32, 32))
    a = jnp.zeros((1, 32, 32, 3), jnp.float32)
    f0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    f1 = jnp.ones((1, 32, 32, 3), jnp.float32)
    y0 = np.asarray(stream.push_device(a, feat=f0))
    y1 = np.asarray(stream.push_device(jnp.zeros_like(a), feat=f1))
    assert y0.shape == (1, 32, 32, 3)
    assert not np.allclose(y0, y1)
    # feat=None still runs (zeros prior)
    y2 = stream.push_device(jnp.zeros_like(a))
    np.testing.assert_allclose(np.asarray(y2), y0, atol=1e-5)


def test_temporal_stream_rejects_feat():
    import dataclasses

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.infer import StreamingGenerator
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS["temporal_512"]
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, ngf=4, ndf=4))
    model = create_model(cfg, steps_per_epoch=10)
    g = model.g_init(jax.random.PRNGKey(0))
    stream = StreamingGenerator(model, g, (32, 32))
    with pytest.raises(ValueError, match="temporal"):
        stream.push_device(jnp.zeros((1, 32, 32, 3)),
                           feat=jnp.zeros((1, 32, 32, 3)))


def test_instance_edges_marks_both_sides():
    from ir2rgb_tpu.nn.encoders import instance_edges
    inst = np.zeros((1, 6, 6), np.int32)
    inst[0, :, 3:] = 1  # vertical boundary between cols 2 and 3
    e = np.asarray(instance_edges(jnp.asarray(inst)))[0, :, :, 0]
    assert (e[:, 2] == 1).all() and (e[:, 3] == 1).all()
    assert (e[:, :2] == 0).all() and (e[:, 4:] == 0).all()
    # uniform map -> no edges
    e0 = np.asarray(instance_edges(jnp.zeros((1, 4, 4), jnp.int32)))
    assert (e0 == 0).all()


def test_instance_edges_train_step_and_stream():
    """use_instance_edges: G and D widths grow by 1, the fused step runs
    with inst in the batch and fails loudly without it; inference passes
    edges through push_device."""
    import dataclasses

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.infer import StreamingGenerator
    from ir2rgb_tpu.nn.encoders import instance_edges
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS["pix2pixhd_512"]
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, ngf=4, ndf=4, n_downsample_global=2,
            n_blocks_global=1, n_blocks_local=1, use_instance_edges=True),
        loss=dataclasses.replace(cfg.loss, no_vgg_loss=True))
    model = create_model(cfg, steps_per_epoch=10)
    assert model.gen_cfg.input_nc == 4
    assert model.disc_cfg.input_nc == 7

    rng = np.random.RandomState(0)
    batch = {
        "a": jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)),
        "b": jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)),
        "inst": jnp.asarray(rng.randint(0, 4, (1, 32, 32))),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state2, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))

    with pytest.raises(ValueError, match="inst"):
        model.loss_and_metrics(state.g_params, state.d_params,
                               {"a": batch["a"], "b": batch["b"]},
                               jax.random.PRNGKey(0), state.pool)

    stream = StreamingGenerator(model, state.g_params, (32, 32))
    e = instance_edges(batch["inst"])
    y = stream.push_device(batch["a"], edges=e)
    assert np.asarray(y).shape == (1, 32, 32, 3)


def test_encoder_rejects_indivisible_input():
    from ir2rgb_tpu.nn.encoders import EncoderConfig, define_e
    cfg = EncoderConfig(nef=4, n_downsample_e=3)
    init, apply = define_e(cfg)
    p = init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible"):
        apply(p, jnp.zeros((1, 30, 32, 3)))
