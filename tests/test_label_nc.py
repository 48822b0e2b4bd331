"""label_nc > 0 — the pix2pixHD semantic-label input surface
(SURVEY.md §2.2 pix2pixHD encode_input row: the reference one-hot
scatters integer label maps into label_nc channels for G and D; ir2rgb
itself runs the label_nc=0 real-IR path, which stays the default)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.train import create_model

LABEL_NC = 5


def label_cfg(**model_kw):
    defaults = dict(model="pix2pix", net_g="resnet_6blocks",
                    net_d="n_layers", ngf=8, ndf=8, get_interm_feat=True,
                    label_nc=LABEL_NC)
    defaults.update(model_kw)
    return Config(
        model=ModelConfig(**defaults),
        data=DataConfig(crop_size=32, batch_size=2),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(niter=1, niter_decay=1),
    )


def label_batch(bsz=2, size=32, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, LABEL_NC, (bsz, size, size, 1)).astype(np.int32)
    b = rng.rand(bsz, size, size, 3).astype(np.float32) * 2 - 1
    return {"a": jnp.asarray(a), "b": jnp.asarray(b)}


def test_encode_label_one_hot_matches_reference_scatter():
    """encode_label == the reference encode_input's scatter_(1, label, 1):
    channel k is 1 exactly where the id map equals k."""
    model = create_model(label_cfg(), steps_per_epoch=10)
    ids = np.array([[[0], [1]], [[4], [2]]], np.int32)[None]  # (1,2,2,1)
    oh = np.asarray(model.encode_label(jnp.asarray(ids)))
    assert oh.shape == (1, 2, 2, LABEL_NC)
    expect = np.zeros((1, 2, 2, LABEL_NC), np.float32)
    for y in range(2):
        for x in range(2):
            expect[0, y, x, ids[0, y, x, 0]] = 1.0
    np.testing.assert_array_equal(oh, expect)
    # float-carried ids (the uint8 serving wire casts to f32) encode the same
    oh_f = np.asarray(model.encode_label(jnp.asarray(ids, jnp.float32)))
    np.testing.assert_array_equal(oh_f, expect)
    # out-of-range ids -> all-zero rows (one_hot semantics)
    oob = np.asarray(model.encode_label(
        jnp.full((1, 2, 2, 1), LABEL_NC + 3, jnp.int32)))
    np.testing.assert_array_equal(oob, np.zeros_like(oob))


def test_channel_accounting():
    """G and D consume label_nc channels instead of input_nc."""
    model = create_model(label_cfg(), steps_per_epoch=10)
    assert model.gen_cfg.input_nc == LABEL_NC
    assert model.disc_cfg.input_nc == LABEL_NC + 3  # + output_nc pair


def test_train_step_runs_on_label_batch():
    cfg = label_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = label_batch()
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    for k in ("G_GAN", "G_L1", "D_real", "D_fake"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1
    # inference from the raw id map
    fake = model.generate(state.g_params, batch["a"], train=False)
    assert fake.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(fake)).all()


def test_label_with_instance_edges():
    """label_nc + use_instance_edges = the reference's default pix2pixHD
    input (one-hot label + boundary channel for both G and D)."""
    model = create_model(label_cfg(use_instance_edges=True),
                         steps_per_epoch=10)
    assert model.gen_cfg.input_nc == LABEL_NC + 1
    assert model.disc_cfg.input_nc == LABEL_NC + 1 + 3
    batch = label_batch()
    batch["inst"] = jnp.asarray(
        np.random.RandomState(1).randint(0, 4, (2, 32, 32)), jnp.int32)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))


def test_temporal_label_rejected():
    with pytest.raises(AssertionError, match="temporal"):
        create_model(label_cfg(model="temporal"), steps_per_epoch=10)


def test_transforms_label_a_preserves_ids():
    """preprocess_pair_batch(label_a=True): the A side is cropped/flipped
    with the pair's shared RNG but never normalized — ids come out
    exactly as they went in."""
    from ir2rgb_tpu.data import preprocess_pair_batch

    rng = np.random.RandomState(0)
    a = rng.randint(0, LABEL_NC, (2, 24, 24, 1)).astype(np.uint8)
    b = rng.randint(0, 256, (2, 24, 24, 3)).astype(np.uint8)
    out = preprocess_pair_batch(jnp.asarray(a), jnp.asarray(b),
                                jax.random.PRNGKey(3), crop_size=16,
                                label_a=True)
    ids = np.asarray(out["a"])
    assert ids.dtype == np.int32
    assert ids.shape == (2, 16, 16, 1)
    assert set(np.unique(ids)) <= set(range(LABEL_NC))
    # the crop window must be the SAME one applied to b: recover the
    # offset by matching the id crop against every possible window
    b_out = np.asarray(out["b"])
    full_a = a.astype(np.int32)
    found = 0
    for i in range(2):
        for oy in range(24 - 16 + 1):
            for ox in range(24 - 16 + 1):
                win = full_a[i, oy:oy + 16, ox:ox + 16]
                flip = win[:, ::-1]
                for cand in (win, flip):
                    if np.array_equal(cand, ids[i]):
                        bw = b[i, oy:oy + 16, ox:ox + 16].astype(np.float32)
                        if np.array_equal(cand, flip) \
                                and not np.array_equal(win, flip):
                            bw = bw[:, ::-1]
                        expect_b = bw / 127.5 - 1.0
                        if np.allclose(b_out[i], expect_b, atol=1e-6):
                            found += 1
                            break
                else:
                    continue
                break
            else:
                continue
            break
    assert found == 2, "paired crop/flip not replayed on the label map"


def test_loader_decodes_label_maps(tmp_path):
    from PIL import Image

    from ir2rgb_tpu.data import DataLoader

    root = tmp_path / "labelds"
    for sub in ("trainA", "trainB"):
        (root / sub).mkdir(parents=True)
    for i in range(4):
        Image.fromarray(np.full((24, 24), i + 1, np.uint8)).save(
            root / "trainA" / f"{i:03d}.png")
        Image.new("RGB", (24, 24), (i * 20, 10, 0)).save(
            root / "trainB" / f"{i:03d}.png")

    cfg = Config(model=ModelConfig(label_nc=LABEL_NC),
                 data=DataConfig(dataroot=str(root), batch_size=2,
                                 preprocess="resize_and_crop",
                                 load_size=24, crop_size=16,
                                 serial_batches=True))
    loader = DataLoader(cfg, phase="train", shuffle=False)
    batch = next(iter(loader.epoch()))
    assert batch["a"].shape == (2, 24, 24, 1)
    assert batch["a"].dtype == np.int32
    np.testing.assert_array_equal(np.unique(batch["a"][0]), [1])
    np.testing.assert_array_equal(np.unique(batch["a"][1]), [2])

    # temporal + label_nc is rejected at the loader too
    cfg_t = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset_mode="temporal"))
    with pytest.raises(ValueError, match="temporal"):
        DataLoader(cfg_t, phase="train")


def test_compat_flag():
    from ir2rgb_tpu.config.compat import from_reference_flags

    cfg = from_reference_flags({"label_nc": 35, "no_instance": False})
    assert cfg.model.label_nc == 35


def test_label2im_palette():
    from ir2rgb_tpu.infer.stream import label2im

    ids = jnp.asarray(np.arange(4, dtype=np.int32).reshape(1, 2, 2, 1))
    img = label2im(ids, 4)
    assert img.shape == (2, 2, 3)
    assert img.dtype == np.uint8
    # id 0 is black; distinct ids get distinct colors (VOC colormap)
    np.testing.assert_array_equal(img[0, 0], [0, 0, 0])
    flat = {tuple(img[y, x]) for y in range(2) for x in range(2)}
    assert len(flat) == 4


def test_export_serving_artifact_label_model(tmp_path):
    """A label_nc model exports and serves raw class-id bytes on the
    uint8 wire (no [-1,1] normalize baked in)."""
    from ir2rgb_tpu.infer.export import (
        export_serving_artifact,
        load_serving_artifact,
    )

    cfg = label_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = label_batch(bsz=1)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    path = str(tmp_path / "label_model.i2r")
    export_serving_artifact(model, state.g_params, (32, 32), path,
                            platforms=("cpu",))
    served = load_serving_artifact(path)
    frame = np.random.RandomState(0).randint(
        0, LABEL_NC, (1, 32, 32, 1)).astype(np.uint8)
    out = served.push(frame)
    # reference output: generate() from the same ids
    expect = model.generate(state.g_params,
                            jnp.asarray(frame, jnp.int32), train=False)
    expect_u8 = ((np.clip(np.asarray(expect, np.float32), -1, 1) + 1)
                 * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(out), expect_u8[0])
    # non-uint8 class-id frames are cast as ids, never [-1,1]-quantized
    # (which would collapse id 0 -> 127, ids >= 1 -> 255)
    out_int = served.push(frame.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(out_int), expect_u8[0])


def test_multistream_label_frames():
    """MultiStreamServer with a label model: int32 id frames produce the
    same output as the uint8 wire (no image quantization applied)."""
    from ir2rgb_tpu.infer.multistream import MultiStreamServer

    cfg = label_cfg()
    model = create_model(cfg, steps_per_epoch=10)
    batch = label_batch(bsz=1)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    server = MultiStreamServer(model, state.g_params, (32, 32), n_slots=1)
    sid = server.open()
    frame = np.random.RandomState(0).randint(
        0, LABEL_NC, (32, 32, 1)).astype(np.uint8)
    out_u8 = server.step({sid: frame})[sid]
    out_int = server.step({sid: frame.astype(np.int32)})[sid]
    np.testing.assert_array_equal(out_u8, out_int)
    expect = model.generate(state.g_params,
                            jnp.asarray(frame[None], jnp.int32),
                            train=False)
    expect_u8 = ((np.clip(np.asarray(expect, np.float32), -1, 1) + 1)
                 * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(out_u8, expect_u8[0])
