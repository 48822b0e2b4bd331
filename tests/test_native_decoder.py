"""Native C++ decoder vs PIL golden tests."""

import glob
import os

import numpy as np
import pytest

from ir2rgb_tpu.data import write_synthetic_dataset
from ir2rgb_tpu.data.native import (
    _decode_batch_pil,
    decode_batch,
    native_available,
)


@pytest.fixture(scope="module")
def png_paths(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("imgs"))
    write_synthetic_dataset(root, n=4, size=40)
    return sorted(glob.glob(os.path.join(root, "B", "*.png")))


needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native decoder unavailable")


@needs_native
def test_native_matches_pil_rgb(png_paths):
    n = decode_batch(png_paths, 40, 40)
    p = _decode_batch_pil(png_paths, 40, 40, False)
    np.testing.assert_array_equal(n, p)  # no-resize path must be exact


@needs_native
def test_native_matches_pil_resized(png_paths):
    n = decode_batch(png_paths, 56, 56)
    p = _decode_batch_pil(png_paths, 56, 56, False)
    assert int(np.abs(n.astype(int) - p.astype(int)).max()) <= 2


@needs_native
def test_native_gray(png_paths):
    n = decode_batch(png_paths, 40, 40, gray=True)
    p = _decode_batch_pil(png_paths, 40, 40, True)
    assert n.shape == (len(png_paths), 40, 40, 1)
    assert int(np.abs(n.astype(int) - p.astype(int)).max()) <= 1


@needs_native
def test_native_jpeg(tmp_path, png_paths):
    from PIL import Image
    jpg = str(tmp_path / "x.jpg")
    with Image.open(png_paths[0]) as im:
        im.convert("RGB").save(jpg, quality=95)
    n = decode_batch([jpg], 40, 40)
    p = _decode_batch_pil([jpg], 40, 40, False)
    # JPEG decoders may differ by a few LSBs (IDCT implementations)
    assert int(np.abs(n.astype(int) - p.astype(int)).max()) <= 4


@needs_native
def test_native_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        decode_batch([str(tmp_path / "nope.png")], 8, 8)


@needs_native
def test_native_corrupt_file_raises_and_names_it(png_paths, tmp_path):
    """Truncated image: the decode must fail loudly and the error must
    name the unreadable file (round-1 verdict item #8)."""
    bad = str(tmp_path / "truncated.png")
    with open(png_paths[0], "rb") as fh:
        data = fh.read()
    with open(bad, "wb") as fh:
        fh.write(data[: len(data) // 3])
    with pytest.raises(IOError, match="truncated.png"):
        decode_batch([png_paths[0], bad], 40, 40)


def test_pil_fallback_corrupt_file_raises(png_paths, tmp_path):
    bad = str(tmp_path / "garbage.png")
    with open(bad, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\nnot-a-real-png")
    with pytest.raises(Exception):
        _decode_batch_pil([bad], 40, 40, False)


def test_loader_rejects_mixed_native_sizes(tmp_path):
    """crop/none/scale_width modes must error on a mixed-resolution
    dataset instead of silently stretching every frame to the first
    file's geometry."""
    from PIL import Image

    from ir2rgb_tpu.config import Config, DataConfig
    from ir2rgb_tpu.data import DataLoader

    root = tmp_path / "mixed"
    for sub in ("trainA", "trainB"):
        (root / sub).mkdir(parents=True)
    for i, size in enumerate([(40, 40), (40, 40), (64, 48)]):
        for sub in ("trainA", "trainB"):
            Image.new("RGB", size, (i * 10, 0, 0)).save(
                root / sub / f"{i:03d}.png")

    cfg = Config(data=DataConfig(dataroot=str(root), preprocess="none"))
    with pytest.raises(ValueError, match="uniform native resolution"):
        DataLoader(cfg, phase="train")
    # resize_and_crop normalizes geometry on the host -> mixed sizes OK
    cfg2 = Config(data=DataConfig(dataroot=str(root),
                                  preprocess="resize_and_crop",
                                  load_size=32, crop_size=16))
    loader = DataLoader(cfg2, phase="train")
    assert loader.target_hw == (32, 32)


@needs_native
def test_native_palette_trns_png(tmp_path):
    """A palette PNG with a tRNS chunk: libpng's EXPAND emits RGBA even
    though the original color_type has no alpha mask — the decoder must
    strip it (not overflow the RGB row buffer) and match PIL's RGB."""
    from PIL import Image

    rng = np.random.RandomState(3)
    idx = rng.randint(0, 8, (40, 40)).astype(np.uint8)
    im = Image.fromarray(idx, mode="P")
    im.putpalette([v for i in range(256) for v in
                   ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)])
    path = str(tmp_path / "pal_trns.png")
    im.save(path, transparency=0)  # index 0 transparent -> tRNS chunk
    n = decode_batch([path], 40, 40)
    p = _decode_batch_pil([path], 40, 40, False)
    assert n.shape == (1, 40, 40, 3)
    np.testing.assert_array_equal(n, p)


@needs_native
def test_native_rgba_png(tmp_path):
    """True RGBA input: alpha stripped, RGB bytes preserved."""
    from PIL import Image

    rng = np.random.RandomState(4)
    arr = rng.randint(0, 255, (32, 32, 4)).astype(np.uint8)
    path = str(tmp_path / "rgba.png")
    Image.fromarray(arr, mode="RGBA").save(path)
    n = decode_batch([path], 32, 32)
    np.testing.assert_array_equal(n[0], arr[..., :3])
