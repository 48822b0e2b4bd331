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


# ---------------------------------------------------------- id maps ----

def _write_id_pngs(tmp_path):
    """One id map per PNG flavor: 8-bit gray, 16-bit gray, palette
    (mode P -> ids are palette indices), and RGB-folded."""
    from PIL import Image
    rng = np.random.RandomState(7)
    paths = {}
    g8 = rng.randint(0, 200, (30, 22)).astype(np.uint8)
    Image.fromarray(g8).save(tmp_path / "g8.png")
    paths["g8"] = (str(tmp_path / "g8.png"), g8.astype(np.int32))
    g16 = rng.randint(0, 40000, (30, 22)).astype(np.uint16)
    Image.fromarray(g16, mode="I;16").save(tmp_path / "g16.png")
    paths["g16"] = (str(tmp_path / "g16.png"), g16.astype(np.int32))
    pal = rng.randint(0, 16, (30, 22)).astype(np.uint8)
    pim = Image.fromarray(pal, mode="P")
    pim.putpalette([(i * 3) % 256 for i in range(768)])
    pim.save(tmp_path / "pal.png")
    paths["pal"] = (str(tmp_path / "pal.png"), pal.astype(np.int32))
    rgb = rng.randint(0, 255, (30, 22, 3)).astype(np.uint8)
    Image.fromarray(rgb).save(tmp_path / "rgb.png")
    folded = (rgb[..., 0].astype(np.int32) * 65536
              + rgb[..., 1].astype(np.int32) * 256
              + rgb[..., 2].astype(np.int32))
    paths["rgb"] = (str(tmp_path / "rgb.png"), folded)
    return paths


@needs_native
def test_native_ids_match_pil_same_size(tmp_path):
    """Every PNG flavor decodes to the file's NATIVE id space (gray
    values / palette indices / folded RGB), matching the PIL path."""
    from ir2rgb_tpu.data.native import decode_ids_batch, _decode_ids_pil

    flavors = _write_id_pngs(tmp_path)
    paths = [p for p, _ in flavors.values()]
    expect = np.stack([e for _, e in flavors.values()])
    nat = decode_ids_batch(paths, 30, 22)
    np.testing.assert_array_equal(nat, expect)
    pil = _decode_ids_pil(paths, 30, 22)
    np.testing.assert_array_equal(pil, expect)


@needs_native
def test_native_ids_nearest_resize_matches_pil(tmp_path):
    """NEAREST resize picks identical source pixels as PIL (both up- and
    down-scaling, non-square)."""
    from ir2rgb_tpu.data.native import decode_ids_batch, _decode_ids_pil

    flavors = _write_id_pngs(tmp_path)
    paths = [p for p, _ in flavors.values()]
    for th, tw in ((15, 11), (17, 9), (60, 44), (31, 23)):
        nat = decode_ids_batch(paths, th, tw)
        pil = _decode_ids_pil(paths, th, tw)
        np.testing.assert_array_equal(nat, pil, err_msg=f"{th}x{tw}")


def test_ids_jpeg_falls_back_to_pil(tmp_path):
    """Non-PNG id files route through PIL transparently (whole batch)."""
    from PIL import Image

    from ir2rgb_tpu.data.native import decode_ids_batch

    g = np.full((20, 20), 9, np.uint8)
    Image.fromarray(g).save(tmp_path / "ids.jpg", quality=98)
    Image.fromarray(g).save(tmp_path / "ids.png")
    out = decode_ids_batch([str(tmp_path / "ids.jpg"),
                            str(tmp_path / "ids.png")], 20, 20)
    assert out.shape == (2, 20, 20) and out.dtype == np.int32
    np.testing.assert_array_equal(out[1], 9)
    # JPEG is lossy but a constant image survives
    assert np.abs(out[0].astype(np.int64) - 9).max() <= 2
