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
