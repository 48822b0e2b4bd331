"""Data pipeline tests: folder indexing, loader batching, paired-augment
determinism (SURVEY.md §4.1), temporal windows."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.data import (
    DataLoader,
    find_aligned_pairs,
    find_temporal_sequences,
    preprocess_pair_batch,
    preprocess_sequence_batch,
    write_synthetic_dataset,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    write_synthetic_dataset(str(root / "pairs"), n=6, size=48)
    write_synthetic_dataset(str(root / "video"), n_videos=2,
                            frames_per_video=5, size=48)
    return root


def test_find_aligned_pairs(dataset_dir):
    pairs = find_aligned_pairs(str(dataset_dir / "pairs"))
    assert len(pairs) == 6
    for a, b in pairs:
        assert os.path.basename(a) == os.path.basename(b)


def test_find_temporal_sequences(dataset_dir):
    wins = find_temporal_sequences(str(dataset_dir / "video"), n_frames=4)
    assert len(wins) == 2 * (5 - 4 + 1)
    assert all(len(w) == 4 for w in wins)


def test_loader_batches(dataset_dir):
    cfg = Config(data=DataConfig(dataroot=str(dataset_dir / "pairs"),
                                 load_size=48, crop_size=32, batch_size=2))
    loader = DataLoader(cfg)
    batch = next(iter(loader))
    assert batch["a"].shape == (2, 48, 48, 3)
    assert batch["a"].dtype == np.uint8


def test_temporal_loader(dataset_dir):
    cfg = Config(data=DataConfig(dataroot=str(dataset_dir / "video"),
                                 load_size=48, crop_size=32, batch_size=2,
                                 dataset_mode="temporal", n_frames_total=3))
    loader = DataLoader(cfg)
    batch = next(iter(loader))
    assert batch["a"].shape == (2, 3, 48, 48, 3)


def test_paired_augment_same_transform():
    """IR and RGB must receive the identical crop/flip (paired augment)."""
    x = np.zeros((2, 48, 48, 3), np.uint8)
    # encode pixel coordinates so any spatial op shows up identically
    yy, xx = np.mgrid[0:48, 0:48]
    x[..., 0] = yy[None]
    x[..., 1] = xx[None]
    out = preprocess_pair_batch(jnp.asarray(x), jnp.asarray(x),
                                jax.random.PRNGKey(3), crop_size=32)
    np.testing.assert_array_equal(np.asarray(out["a"]),
                                  np.asarray(out["b"]))
    assert out["a"].shape == (2, 32, 32, 3)
    # normalized range
    assert float(out["a"].min()) >= -1.0 and float(out["a"].max()) <= 1.0


def test_augment_deterministic_under_key():
    x = np.random.RandomState(0).randint(0, 255, (2, 48, 48, 3), np.uint8)
    k = jax.random.PRNGKey(7)
    o1 = preprocess_pair_batch(jnp.asarray(x), jnp.asarray(x), k, 32)
    o2 = preprocess_pair_batch(jnp.asarray(x), jnp.asarray(x), k, 32)
    np.testing.assert_array_equal(np.asarray(o1["a"]), np.asarray(o2["a"]))


def test_sequence_augment_consistent_across_time():
    x = np.random.RandomState(0).randint(0, 255, (1, 3, 48, 48, 3),
                                         np.uint8)
    # all frames identical -> augmented frames must stay identical
    x[:] = x[:, :1]
    out = preprocess_sequence_batch(jnp.asarray(x), jnp.asarray(x),
                                    jax.random.PRNGKey(0), crop_size=32)
    a = np.asarray(out["a"])
    np.testing.assert_array_equal(a[:, 0], a[:, 1])
    np.testing.assert_array_equal(a[:, 0], a[:, 2])


def test_eval_center_crop():
    x = np.random.RandomState(0).randint(0, 255, (1, 48, 48, 3), np.uint8)
    out = preprocess_pair_batch(jnp.asarray(x), jnp.asarray(x),
                                jax.random.PRNGKey(0), crop_size=32,
                                train=False)
    expected = x[:, 8:40, 8:40, :].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(out["a"]), expected, atol=1e-6)


def test_preprocess_modes_resolve_target(dataset_dir):
    from ir2rgb_tpu.data.loader import resolve_target_hw
    first = str(dataset_dir / "pairs" / "A" / "0000.png")
    assert resolve_target_hw("resize_and_crop", 64, first) == (64, 64)
    # synthetic images are 48x48 square: scale_width keeps aspect
    assert resolve_target_hw("scale_width", 64, first) == (64, 64)
    assert resolve_target_hw("none", 64, first) == (48, 48)
    assert resolve_target_hw("crop", 64, first) == (48, 48)


def test_no_crop_mode_batch(dataset_dir):
    import dataclasses
    cfg = Config(data=DataConfig(dataroot=str(dataset_dir / "pairs"),
                                 load_size=48, crop_size=32, batch_size=2,
                                 preprocess="none"))
    loader = DataLoader(cfg)
    batch = next(iter(loader))
    assert batch["a"].shape == (2, 48, 48, 3)
    out = preprocess_pair_batch(jnp.asarray(batch["a"]),
                                jnp.asarray(batch["b"]),
                                jax.random.PRNGKey(0), crop_size=None)
    assert out["a"].shape == (2, 48, 48, 3)


def test_sequence_no_crop_mode():
    """crop_size=None (scale_width/none modes) on temporal windows:
    flip+normalize only, one decision per window (advisor round-1 bug —
    this used to raise TypeError)."""
    r = np.random.RandomState(3)
    x = (r.rand(2, 3, 20, 24, 3) * 255).astype(np.uint8)
    out = preprocess_sequence_batch(jnp.asarray(x), jnp.asarray(x),
                                    jax.random.PRNGKey(0), crop_size=None,
                                    train=True)
    assert out["a"].shape == (2, 3, 20, 24, 3)
    np.testing.assert_allclose(np.asarray(out["a"]),
                               np.asarray(out["b"]), atol=0)
    # every frame of a window got the same flip decision: frames stay
    # either all flipped or all not vs the normalized input
    ref = np.asarray(x, np.float32) / 127.5 - 1.0
    a = np.asarray(out["a"])
    for w in range(2):
        flipped = np.allclose(a[w], ref[w, :, :, ::-1, :], atol=1e-6)
        unflipped = np.allclose(a[w], ref[w], atol=1e-6)
        assert flipped or unflipped
    # eval path: deterministic, no flip
    out_eval = preprocess_sequence_batch(jnp.asarray(x), jnp.asarray(x),
                                         jax.random.PRNGKey(0),
                                         crop_size=None, train=False)
    np.testing.assert_allclose(np.asarray(out_eval["a"]), ref, atol=1e-6)
