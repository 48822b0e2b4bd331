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


def test_direction_btoa_swaps_pairs(dataset_dir):
    """reference --which_direction BtoA: the loader feeds B as input and
    A as target (aligned_dataset's swap), in aligned AND temporal modes."""
    cfg = Config(data=DataConfig(dataroot=str(dataset_dir / "pairs"),
                                 load_size=48, crop_size=32, batch_size=2,
                                 serial_batches=True))
    fwd = next(iter(DataLoader(cfg, shuffle=False).epoch()))
    cfg_r = cfg.replace(data=dataclasses.replace(cfg.data,
                                                 direction="BtoA"))
    rev = next(iter(DataLoader(cfg_r, shuffle=False).epoch()))
    np.testing.assert_array_equal(rev["a"], fwd["b"])
    np.testing.assert_array_equal(rev["b"], fwd["a"])

    cfg_t = Config(data=DataConfig(dataroot=str(dataset_dir / "video"),
                                   load_size=48, crop_size=32,
                                   batch_size=2, dataset_mode="temporal",
                                   n_frames_total=3, serial_batches=True,
                                   direction="BtoA"))
    cfg_tf = cfg_t.replace(data=dataclasses.replace(cfg_t.data,
                                                    direction="AtoB"))
    t_fwd = next(iter(DataLoader(cfg_tf, shuffle=False).epoch()))
    t_rev = next(iter(DataLoader(cfg_t, shuffle=False).epoch()))
    np.testing.assert_array_equal(t_rev["a"], t_fwd["b"])

    with pytest.raises(ValueError, match="direction"):
        DataLoader(cfg.replace(data=dataclasses.replace(
            cfg.data, direction="sideways")))


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


def test_inst_maps_same_transform_as_pair():
    """Instance maps get the identical crop+flip as the image pair
    (replayed RNG keys), stay integer, and are never normalized."""
    r = np.random.RandomState(5)
    a = (r.rand(3, 20, 20, 3) * 255).astype(np.uint8)
    # encode the pixel's row index into both the image and the inst map
    rows = np.broadcast_to(np.arange(20)[None, :, None], (3, 20, 20))
    cols = np.broadcast_to(np.arange(20)[None, None, :], (3, 20, 20))
    code = (rows * 100 + cols).astype(np.int32)
    a_code = (code % 251).astype(np.uint8)[..., None].repeat(3, -1)
    out = preprocess_pair_batch(jnp.asarray(a_code), jnp.asarray(a_code),
                                jax.random.PRNGKey(3), crop_size=12,
                                inst=jnp.asarray(code), train=True)
    assert out["inst"].dtype == jnp.int32
    assert out["inst"].shape == (3, 12, 12)
    # the inst map must encode exactly the pixels the image kept
    kept = np.asarray((out["a"] + 1) * 127.5).round().astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out["inst"]) % 251,
                                  kept[..., 0])


def test_loader_inst_maps(tmp_path):
    from PIL import Image

    from ir2rgb_tpu.config import Config, DataConfig, ModelConfig
    from ir2rgb_tpu.data import DataLoader

    root = tmp_path / "featds"
    for sub in ("trainA", "trainB", "trainInst"):
        (root / sub).mkdir(parents=True)
    for i in range(4):
        for sub in ("trainA", "trainB"):
            Image.new("RGB", (24, 24), (i * 20, 10, 0)).save(
                root / sub / f"{i:03d}.png")
        Image.fromarray(np.full((24, 24), i + 1, np.uint8)).save(
            root / "trainInst" / f"{i:03d}.png")

    cfg = Config(model=ModelConfig(use_instance_feat=True),
                 data=DataConfig(dataroot=str(root), batch_size=2,
                                 preprocess="resize_and_crop",
                                 load_size=24, crop_size=16,
                                 serial_batches=True))
    loader = DataLoader(cfg, phase="train", shuffle=False)
    batch = next(iter(loader.epoch()))
    assert batch["inst"].shape == (2, 24, 24)
    assert batch["inst"].dtype == np.int32
    np.testing.assert_array_equal(np.unique(batch["inst"][0]), [1])

    # missing inst folder -> clear error
    import shutil
    shutil.rmtree(root / "trainInst")
    with pytest.raises(FileNotFoundError, match="instance-map"):
        DataLoader(cfg, phase="train")


def test_uniform_size_scan_bounded_startup(tmp_path, monkeypatch):
    """Round-2 verdict weak #5: init must NOT open every file's header.
    A few-thousand-file dataset (symlinked tiny PNGs) pays at most
    SIZE_CHECK_STARTUP_CAP+1 header opens at DataLoader init; the rest
    are verified lazily as batches touch them."""
    from PIL import Image

    from ir2rgb_tpu.data import loader as loader_mod

    root = tmp_path / "bigds"
    for sub in ("trainA", "trainB"):
        (root / sub).mkdir(parents=True)
    src = {}
    for sub in ("trainA", "trainB"):
        p = root / sub / "0000.png"
        Image.new("RGB", (16, 16), (1, 2, 3)).save(p)
        src[sub] = p
    n = 1500
    for i in range(1, n):
        for sub in ("trainA", "trainB"):
            os.symlink(src[sub], root / sub / f"{i:04d}.png")

    calls = []
    real = loader_mod._native_size

    def counting(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(loader_mod, "_native_size", counting)
    cfg = Config(data=DataConfig(dataroot=str(root), preprocess="none",
                                 batch_size=2, serial_batches=True))
    loader = DataLoader(cfg, phase="train")
    cap = DataLoader.SIZE_CHECK_STARTUP_CAP
    # +1 for resolve_target_hw's probe of the first image
    assert len(calls) <= cap + 1, len(calls)
    # lazy path: first batch verifies only its own (unchecked) files
    before = len(calls)
    next(iter(loader.epoch()))
    assert len(calls) - before <= 2 * cfg.data.batch_size


def test_uniform_size_violation_caught_lazily(tmp_path):
    """A mixed-size file that the bounded startup sample skips is still
    rejected — at the batch that touches it, with the same clear error
    (raised through the prefetch thread, not swallowed)."""
    from PIL import Image

    root = tmp_path / "lazymix"
    for sub in ("trainA", "trainB"):
        (root / sub).mkdir(parents=True)
    n = 600  # unique paths per side; 2n total > 2*cap ensures stride > 1
    for i in range(n):
        for sub in ("trainA", "trainB"):
            Image.new("RGB", (16, 16), (0, 0, 0)).save(
                root / sub / f"{i:04d}.png")
    # index 1 is never in a strided sample with stride > 1
    Image.new("RGB", (24, 16), (0, 0, 0)).save(root / "trainB" / "0001.png")

    cfg = Config(data=DataConfig(dataroot=str(root), preprocess="none",
                                 batch_size=2, serial_batches=True))
    loader = DataLoader(cfg, phase="train")  # startup sample misses it
    with pytest.raises(ValueError, match="uniform native resolution"):
        for _ in loader:  # prefetch thread must propagate, not swallow
            pass


def test_prefetch_propagates_exceptions():
    from ir2rgb_tpu.data.loader import _prefetch

    def gen():
        yield 1
        raise RuntimeError("decode exploded")

    it = _prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(it)


def test_ab_count_mismatch_raises(tmp_path):
    """A missing mid-sequence file must fail loudly, not silently
    misalign every later pair (truncate-and-zip supervision corruption)."""
    from PIL import Image

    root = tmp_path / "mismatch"
    for sub in ("trainA", "trainB"):
        (root / sub).mkdir(parents=True)
    for i in range(5):
        Image.new("RGB", (16, 16)).save(root / "trainA" / f"{i:03d}.png")
        if i != 2:  # B is missing frame 2
            Image.new("RGB", (16, 16)).save(root / "trainB" / f"{i:03d}.png")
    with pytest.raises(ValueError, match="count mismatch"):
        find_aligned_pairs(str(root))
    # the error should name the first divergent basename (002)
    try:
        find_aligned_pairs(str(root))
    except ValueError as e:
        assert "002" in str(e)


def test_temporal_count_mismatch_raises(tmp_path):
    from PIL import Image

    root = tmp_path / "vidmismatch"
    for sub in ("A", "B"):
        (root / sub / "vid000").mkdir(parents=True)
    for i in range(4):
        Image.new("RGB", (16, 16)).save(
            root / "A" / "vid000" / f"{i:03d}.png")
        if i != 1:
            Image.new("RGB", (16, 16)).save(
                root / "B" / "vid000" / f"{i:03d}.png")
    with pytest.raises(ValueError, match="count mismatch"):
        find_temporal_sequences(str(root), n_frames=2)


def test_loader_rejects_dataset_smaller_than_batch(dataset_dir):
    """Fewer items than one batch would make __iter__ spin forever
    (partial batches are dropped for static jit shapes)."""
    cfg = Config(data=DataConfig(dataroot=str(dataset_dir / "pairs"),
                                 load_size=48, crop_size=32,
                                 batch_size=64))
    with pytest.raises(ValueError, match="batch_size"):
        DataLoader(cfg)


def test_single_mode_dataset(tmp_path):
    """dataset_mode=single: input-only folders (testA/ or a flat dir)
    index without a B folder; the loader yields uniform a/b batches."""
    import dataclasses

    from PIL import Image

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.data.folder import find_single_images
    from ir2rgb_tpu.data.loader import DataLoader

    root = tmp_path / "ds"
    (root / "testA").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                        ).save(root / "testA" / f"{i}.png")
    items = find_single_images(str(root), "test")
    assert len(items) == 3 and items[0][0] == items[0][1]

    # flat folder as the root itself
    assert len(find_single_images(str(root / "testA"), "test")) == 3

    cfg = PRESETS["pix2pix_unet256"]
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataroot=str(root), dataset_mode="single", phase="test",
        load_size=40, batch_size=1, serial_batches=True))
    loader = DataLoader(cfg, phase="test", shuffle=False)
    batch = next(iter(loader.epoch()))
    assert batch["a"].shape == (1, 40, 40, 3)
    np.testing.assert_array_equal(batch["a"], batch["b"])

    with pytest.raises(ValueError, match="dataset_mode"):
        DataLoader(cfg.replace(data=dataclasses.replace(
            cfg.data, dataset_mode="bogus")), phase="test")

    # a PAIRED-layout root with no test-phase input folder must refuse,
    # not recursively sweep trainA+trainB ground truth as inputs
    paired = tmp_path / "paired"
    for sub in ("trainA", "trainB"):
        (paired / sub).mkdir(parents=True)
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                        ).save(paired / sub / "0.png")
    with pytest.raises(FileNotFoundError, match="refusing"):
        find_single_images(str(paired), "test")
