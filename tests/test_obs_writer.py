"""Async gallery writer (obs/writer.py) + native PNG encoder
(native/decoder.cpp::i2r_encode_png) — the off-hot-path write story."""

import os

import numpy as np
import pytest

from ir2rgb_tpu.data.native import decode_batch, encode_png, encode_png_batch
from ir2rgb_tpu.obs import AsyncImageWriter, Visualizer


def test_encode_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(40, 52, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    encode_png(p, img)
    back = decode_batch([p], 40, 52)[0]
    np.testing.assert_array_equal(back, img)


def test_encode_png_gray_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = (rng.rand(16, 16) * 255).astype(np.uint8)
    p = str(tmp_path / "g.png")
    encode_png(p, img)
    back = decode_batch([p], 16, 16, gray=True)[0][..., 0]
    np.testing.assert_array_equal(back, img)


def test_encode_png_batch_threaded(tmp_path):
    rng = np.random.RandomState(2)
    imgs = (rng.rand(6, 20, 24, 3) * 255).astype(np.uint8)
    paths = [str(tmp_path / f"b{i}.png") for i in range(6)]
    encode_png_batch(paths, imgs, threads=3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(decode_batch([p], 20, 24)[0], imgs[i])


def test_async_writer_flush_barrier(tmp_path):
    w = AsyncImageWriter(workers=2, max_queue=4)
    rng = np.random.RandomState(3)
    paths = [str(tmp_path / f"a{i}.png") for i in range(10)]
    for p in paths:
        w.write(p, (rng.rand(8, 8, 3) * 255).astype(np.uint8))
    w.flush()
    assert all(os.path.exists(p) for p in paths)
    w.close()


def test_async_writer_surfaces_errors(tmp_path):
    w = AsyncImageWriter(workers=1)
    w.write(str(tmp_path / "no_such_dir" / "x.png"),
            np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(Exception):
        w.flush()
    w.close()


def test_visualizer_display_uses_async_writer(tmp_path):
    vis = Visualizer(str(tmp_path), "t")
    img = np.full((8, 8, 3), 7, np.uint8)
    vis.display_current_results({"fake": img}, epoch=1, step=5)
    vis.flush()
    out = os.path.join(str(tmp_path), "web", "images",
                       "epoch001_step0000005_fake.png")
    assert os.path.exists(out)
    np.testing.assert_array_equal(decode_batch([out], 8, 8)[0], img)


def test_html_page_per_row_width(tmp_path):
    """Each add_images row keeps its own display width — a later call
    must not retroactively resize earlier rows."""
    from ir2rgb_tpu.obs.html import HTMLPage

    page = HTMLPage(str(tmp_path / "web"), "t")
    page.add_images(["a.png"], ["a"], width=512)
    page.add_images(["b.png"], ["b"], width=128)
    html = open(page.save()).read()
    assert 'width="512"' in html and 'width="128"' in html


def test_visualizer_dashboard_keeps_all_epochs(tmp_path):
    """The reference training dashboard accumulates every displayed
    epoch on one page, newest first — a later display must not drop
    earlier rows (round-3 fix)."""
    vis = Visualizer(str(tmp_path), "t")
    img = np.full((8, 8, 3), 7, np.uint8)
    vis.display_current_results({"fake": img}, epoch=1, step=5)
    vis.display_current_results({"fake": img}, epoch=2, step=10)
    vis.flush()
    html = open(os.path.join(str(tmp_path), "web", "index.html")).read()
    assert "epoch 1, step 5" in html and "epoch 2, step 10" in html
    # newest first
    assert html.index("epoch 2") < html.index("epoch 1")


def test_gallery_multi_video_no_basename_collision(tmp_path):
    """Frames with identical basenames in different video folders must
    not overwrite each other's gallery images (round-3 review)."""
    from ir2rgb_tpu.obs import Visualizer
    from ir2rgb_tpu.obs.html import HTMLPage

    vis = Visualizer(str(tmp_path), "t")
    page = HTMLPage(str(tmp_path / "web"), "t")
    img = np.zeros((8, 8, 3), np.uint8)
    vis.save_images(page, {"generated": img}, "/d/A/vid000/0001.png")
    vis.save_images(page, {"generated": img + 1}, "/d/A/vid001/0001.png")
    vis.flush()
    page.save()
    names = sorted(os.listdir(page.img_dir))
    assert len([n for n in names if n.endswith("_generated.png")]) == 2, \
        names


def test_html_escapes_filenames(tmp_path):
    """'#' and quotes in frame names must not corrupt gallery URLs."""
    from ir2rgb_tpu.obs.html import HTMLPage

    page = HTMLPage(str(tmp_path / "web"), "t")
    page.add_images(['frame #1"x.png'], ["cap"])
    out = open(page.save()).read()
    assert 'frame #1' not in out          # raw '#' would truncate the URL
    assert "frame%20%231" in out          # quoted form present
