"""MJPEG/AVI video writer (obs/video.py) + native in-memory JPEG encode.

Container correctness is checked two ways: the module's own
read_mjpeg_avi round-trip (movi walk), and an independent strict parse
of the RIFF structure in this file (header fields, idx1 entries) so a
writer bug can't hide behind a matching reader bug.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from ir2rgb_tpu.data import native
from ir2rgb_tpu.obs.video import MJPEGAviWriter, read_mjpeg_avi


def _smooth_frames(n=6, h=64, w=80, c=3):
    """JPEG-friendly moving gradients (random noise is JPEG's worst case)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for t in range(n):
        chans = [(xx + 11 * t) % 256, (yy * 2 + 5 * t) % 256,
                 ((xx + yy) / 2 + 3 * t) % 256][:c]
        out.append(np.stack(chans, -1).astype(np.uint8))
    return np.stack(out)


def _psnr(a, b):
    err = a.astype(np.float32) - b.astype(np.float32)
    return 10 * np.log10(255.0 ** 2 / max(float(np.mean(err ** 2)), 1e-9))


# ---------------------------------------------------------------- encode


def test_encode_jpeg_native_roundtrip():
    import io

    from PIL import Image
    img = _smooth_frames(1)[0]
    data = native.encode_jpeg(img, quality=92)
    assert data[:2] == b"\xff\xd8"  # JPEG SOI marker
    back = np.asarray(Image.open(io.BytesIO(data)), np.uint8)
    assert back.shape == img.shape
    assert _psnr(back, img) > 35


def test_encode_jpeg_gray():
    import io

    from PIL import Image
    img = _smooth_frames(1, c=3)[0][..., :1]
    data = native.encode_jpeg(img[..., 0], quality=90)  # HW layout
    back = np.asarray(Image.open(io.BytesIO(data)), np.uint8)
    assert back.shape == img.shape[:2]
    assert _psnr(back, img[..., 0]) > 35


def test_encode_jpeg_matches_pil_fallback():
    """Native and PIL paths encode the same pixels (both lossy; compare
    through the decoded images, not the bitstreams)."""
    import io

    from PIL import Image
    img = _smooth_frames(1)[0]
    nat = native.encode_jpeg(img, quality=90)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    a = np.asarray(Image.open(io.BytesIO(nat)), np.float32)
    b = np.asarray(Image.open(io.BytesIO(buf.getvalue())), np.float32)
    assert _psnr(a, b) > 35


# ---------------------------------------------------------------- writer


def test_avi_roundtrip(tmp_path):
    frames = _smooth_frames()
    path = str(tmp_path / "clip.avi")
    with MJPEGAviWriter(path, fps=29.97, quality=92) as w:
        for fr in frames:
            w.add(fr)
        assert w.frames == len(frames)
    back, fps = read_mjpeg_avi(path)
    assert back.shape == frames.shape
    assert abs(fps - 29.97) < 0.01
    assert _psnr(back, frames) > 35


def test_avi_gray_roundtrip(tmp_path):
    frames = _smooth_frames(c=1)
    path = str(tmp_path / "gray.avi")
    with MJPEGAviWriter(path, fps=24) as w:
        for fr in frames:
            w.add(fr)
    back, fps = read_mjpeg_avi(path)
    assert back.shape == frames.shape
    assert abs(fps - 24.0) < 1e-6
    assert _psnr(back, frames) > 35


def test_avi_container_structure(tmp_path):
    """Independent strict parse: RIFF sizing, header fields, idx1."""
    frames = _smooth_frames(n=5, h=48, w=56)
    path = str(tmp_path / "strict.avi")
    with MJPEGAviWriter(path, fps=30) as w:
        for fr in frames:
            w.add(fr)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8

    # avih: 14 DWORDs right after 'RIFF..AVI LIST..hdrl avih <size>'
    i = data.index(b"avih") + 8
    usec, _, _, flags, total = struct.unpack_from("<5I", data, i)
    assert usec == round(1e6 / 30)
    assert flags & 0x10  # AVIF_HASINDEX
    assert total == 5
    w_, h_ = struct.unpack_from("<2I", data, i + 32)
    assert (w_, h_) == (56, 48)

    # strh: 'vids'/'MJPG', scale/rate == fps, dwLength == frames
    j = data.index(b"strh") + 8
    assert data[j:j + 4] == b"vids" and data[j + 4:j + 8] == b"MJPG"
    scale, rate = struct.unpack_from("<2I", data, j + 20)
    assert rate / scale == 30
    assert struct.unpack_from("<I", data, j + 32)[0] == 5  # dwLength
    bufsize = struct.unpack_from("<I", data, j + 36)[0]
    assert bufsize > 0

    # strf BITMAPINFOHEADER
    k = data.index(b"strf") + 8
    bisize, biw, bih = struct.unpack_from("<I2i", data, k)
    assert (bisize, biw, bih) == (40, 56, 48)
    assert data[k + 16:k + 20] == b"MJPG"

    # movi list size must close exactly at idx1
    m = data.index(b"LIST", 12)
    while data[m + 8:m + 12] != b"movi":
        m = data.index(b"LIST", m + 4)
    movi_size = struct.unpack_from("<I", data, m + 4)[0]
    idx1_pos = m + 8 + movi_size
    assert data[idx1_pos:idx1_pos + 4] == b"idx1"
    n_entries = struct.unpack_from("<I", data, idx1_pos + 4)[0] // 16
    assert n_entries == 5

    # every idx1 offset (relative to the 'movi' fourcc) must land on a
    # '00dc' chunk whose size matches the entry, and each payload must
    # be a JPEG (SOI marker)
    fourcc_pos = m + 8
    for e in range(n_entries):
        ck, fl, off, size = struct.unpack_from(
            "<4s3I", data, idx1_pos + 8 + 16 * e)
        assert ck == b"00dc" and fl & 0x10
        chunk = fourcc_pos + off
        assert data[chunk:chunk + 4] == b"00dc"
        assert struct.unpack_from("<I", data, chunk + 4)[0] == size
        assert data[chunk + 8:chunk + 10] == b"\xff\xd8"
        assert size <= bufsize


def test_avi_rejects_geometry_change(tmp_path):
    with MJPEGAviWriter(str(tmp_path / "x.avi")) as w:
        w.add(np.zeros((32, 32, 3), np.uint8))
        with pytest.raises(ValueError, match="frame size changed"):
            w.add(np.zeros((16, 32, 3), np.uint8))


def test_avi_rejects_bad_frames(tmp_path):
    with MJPEGAviWriter(str(tmp_path / "x.avi")) as w:
        with pytest.raises(TypeError, match="uint8"):
            w.add(np.zeros((8, 8, 3), np.float32))
        with pytest.raises(ValueError, match="channels"):
            w.add(np.zeros((8, 8, 4), np.uint8))


def test_avi_zero_frames_still_valid(tmp_path):
    path = str(tmp_path / "empty.avi")
    MJPEGAviWriter(path).close()
    back, _ = read_mjpeg_avi(path)
    assert back.shape[0] == 0
    data = open(path, "rb").read()
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8


def test_avi_fps_rationals():
    from ir2rgb_tpu.obs.video import _fps_to_rational
    assert _fps_to_rational(30) == (1, 30)
    assert _fps_to_rational(29.97) == (1001, 30000)
    assert _fps_to_rational(23.976) == (1001, 24000)
    s, r = _fps_to_rational(12.5)
    assert r / s == 12.5


# ------------------------------------------------------------------ CLI


def test_infer_cli_writes_video(tmp_path):
    """test.py --infer.video assembles the generated frames into a
    playable MJPEG AVI next to the gallery."""
    import torch

    import torch_refs
    from ir2rgb_tpu.data import write_synthetic_dataset
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    root = str(tmp_path / "data")
    write_synthetic_dataset(root, n=3, size=48)
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    ckpt = str(tmp_path / "latest_net_G.pth")
    torch.save(t.state_dict(), ckpt)
    avi = str(tmp_path / "out" / "clip.avi")
    out = subprocess.run(
        [sys.executable, "test.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", root, "--data.load_size", "48",
         "--data.crop_size", "32",
         "--train.name", "cli_video",
         "--infer.results_dir", str(tmp_path / "results"),
         "--infer.video", avi, "--infer.video_fps", "12",
         "--torch_g", ckpt],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "video:" in out.stdout
    back, fps = read_mjpeg_avi(avi)
    assert back.shape == (3, 32, 32, 3)
    assert abs(fps - 12.0) < 1e-6
