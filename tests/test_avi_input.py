"""MJPEG/AVI video files as dataset inputs (data/video.py).

Round-trips against the writer (obs/video.py), exercises the container
index (idx1 both offset conventions + no-idx1 movi scan), the native
in-memory JPEG batch decode + PIL fallback, loader integration (aligned,
temporal windows that must not cross file boundaries, uniform-size
rejection), and a test.py e2e drive: AVI in -> AVI out.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from ir2rgb_tpu.data import native
from ir2rgb_tpu.data.video import (
    avi_index,
    avi_native_size,
    decode_mixed_batch,
    frame_paths,
    is_virtual_frame,
    sequence_key,
    split_virtual,
)
from ir2rgb_tpu.obs.video import MJPEGAviWriter


def _frames(n=9, h=64, w=80, shift=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([
        np.stack([(xx + 11 * t + shift) % 256, (yy * 2 + 5 * t) % 256,
                  ((xx + yy) / 2 + 3 * t) % 256], -1).astype(np.uint8)
        for t in range(n)])


def _write(path, frames, fps=25, quality=95):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with MJPEGAviWriter(path, fps=fps, quality=quality) as w:
        for fr in frames:
            w.add(fr)


def _psnr(a, b):
    err = a.astype(np.float32) - b.astype(np.float32)
    return 10 * np.log10(255.0 ** 2 / max(float(np.mean(err ** 2)), 1e-9))


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("avi")
    frames = _frames()
    path = str(root / "clip.avi")
    _write(path, frames)
    return path, frames


# ----------------------------------------------------------------- index


def test_index_basics(clip):
    path, frames = clip
    idx = avi_index(path)
    assert idx.n == len(frames)
    assert idx.fps == 25.0
    assert idx.hw == frames.shape[1:3]
    assert avi_native_size(path) == frames.shape[1:3]
    vp = frame_paths(path)
    assert len(vp) == len(frames)
    assert is_virtual_frame(vp[0])
    assert split_virtual(vp[3]) == (path, 3)
    assert sequence_key(vp[3]) == path
    assert sequence_key("/x/y/img.png") == "/x/y"


def test_index_without_idx1(clip, tmp_path):
    """Files from writers that skip the index are scanned via movi."""
    path, frames = clip
    data = open(path, "rb").read()
    i = data.index(b"idx1")
    stripped = bytearray(data[:i])
    struct.pack_into("<I", stripped, 4, len(stripped) - 8)
    p2 = str(tmp_path / "noidx.avi")
    open(p2, "wb").write(bytes(stripped))
    idx = avi_index(p2)
    assert idx.n == len(frames)
    dec = decode_mixed_batch(frame_paths(p2)[:3], *frames.shape[1:3])
    assert _psnr(dec, frames[:3]) > 35


def test_index_absolute_offset_idx1(clip, tmp_path):
    """Some muxers write idx1 offsets as absolute file positions; the
    disambiguation probe must handle both conventions."""
    path, frames = clip
    data = bytearray(open(path, "rb").read())
    m = data.index(b"LIST", 12)
    while data[m + 8:m + 12] != b"movi":
        m = data.index(b"LIST", m + 4)
    i = data.index(b"idx1")
    n = struct.unpack_from("<I", data, i + 4)[0] // 16
    for e in range(n):
        off = struct.unpack_from("<I", data, i + 8 + 16 * e + 8)[0]
        struct.pack_into("<I", data, i + 8 + 16 * e + 8, off + m + 8)
    p2 = str(tmp_path / "abs.avi")
    open(p2, "wb").write(bytes(data))
    idx = avi_index(p2)
    assert idx.n == len(frames)
    dec = decode_mixed_batch(frame_paths(p2)[:2], *frames.shape[1:3])
    assert _psnr(dec, frames[:2]) > 35


def test_rejects_non_mjpeg_stream(clip, tmp_path):
    path, _ = clip
    data = bytearray(open(path, "rb").read())
    i = data.index(b"strh")
    data[i + 12:i + 16] = b"H264"
    p2 = str(tmp_path / "h264.avi")
    open(p2, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="not MJPG"):
        avi_index(p2)


def test_rejects_non_avi(tmp_path):
    p = str(tmp_path / "x.avi")
    open(p, "wb").write(b"not an avi at all" * 10)
    with pytest.raises(ValueError, match="not a RIFF AVI"):
        avi_index(p)


# ---------------------------------------------------------------- decode


def test_decode_sequential_and_scattered(clip):
    path, frames = clip
    vp = frame_paths(path)
    h, w = frames.shape[1:3]
    dec = decode_mixed_batch(vp[:4], h, w)
    assert _psnr(dec, frames[:4]) > 40
    sel = [5, 1, 8, 1]  # out of order, with a repeat
    dec2 = decode_mixed_batch([vp[i] for i in sel], h, w)
    assert _psnr(dec2, frames[sel]) > 40


def test_decode_resize_and_gray(clip):
    path, frames = clip
    vp = frame_paths(path)
    dec = decode_mixed_batch(vp[:2], 32, 40)
    assert dec.shape == (2, 32, 40, 3)
    g = decode_mixed_batch(vp[:2], *frames.shape[1:3], gray=True)
    assert g.shape == (2,) + frames.shape[1:3] + (1,)
    luma = (0.299 * frames[:2, ..., 0] + 0.587 * frames[:2, ..., 1]
            + 0.114 * frames[:2, ..., 2])
    assert _psnr(g[..., 0], luma) > 35


def test_decode_mixed_avi_and_png(clip, tmp_path):
    """One batch mixing container frames and plain image files keeps
    order (the aligned A=avi / B=png layout decodes through one funnel)."""
    path, frames = clip
    h, w = frames.shape[1:3]
    png = str(tmp_path / "f.png")
    native.encode_png(png, frames[2])
    vp = frame_paths(path)
    dec = native.decode_batch([vp[0], png, vp[1]], h, w)
    assert _psnr(dec[0], frames[0]) > 40
    assert np.array_equal(dec[1], frames[2])  # PNG is lossless
    assert _psnr(dec[2], frames[1]) > 40


def test_decode_out_of_range_frame(clip):
    path, frames = clip
    with pytest.raises(IndexError, match="has 9 frames"):
        decode_mixed_batch([f"{path}#000099"], *frames.shape[1:3])


def test_pil_fallback_matches_native(clip, monkeypatch):
    path, frames = clip
    vp = frame_paths(path)
    h, w = frames.shape[1:3]
    nat = decode_mixed_batch(vp[:3], h, w)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_FAILED", True)
    pil = decode_mixed_batch(vp[:3], h, w)
    # both decode the same JPEG bitstream — bit-identical up to IDCT
    # rounding; allow a tiny band
    assert np.max(np.abs(nat.astype(np.int16) - pil.astype(np.int16))) <= 1


# ---------------------------------------------------------------- loader


def _avi_pair_root(tmp_path, n=9, two_clips=False):
    root = str(tmp_path / "ds")
    a, b = _frames(n), _frames(n, shift=128)
    _write(os.path.join(root, "A", "clip0.avi"), a)
    _write(os.path.join(root, "B", "clip0.avi"), b)
    if two_clips:
        _write(os.path.join(root, "A", "clip1.avi"), a[::-1])
        _write(os.path.join(root, "B", "clip1.avi"), b[::-1])
    return root, a, b


def _cfg(root, preset="pix2pix_unet256", **data_kw):
    import dataclasses

    from ir2rgb_tpu.config import PRESETS
    cfg = PRESETS[preset]
    kw = dict(dataroot=root, load_size=64, crop_size=32, batch_size=2,
              preprocess="none", serial_batches=True)
    kw.update(data_kw)
    return cfg.replace(data=dataclasses.replace(cfg.data, **kw))


def test_loader_aligned_avi(tmp_path):
    from ir2rgb_tpu.data import DataLoader
    root, a, b = _avi_pair_root(tmp_path)
    ld = DataLoader(_cfg(root), phase="train", shuffle=False)
    batch = next(iter(ld.epoch()))
    assert batch["a"].shape == (2, 64, 80, 3)
    assert _psnr(batch["a"], a[:2]) > 40
    assert _psnr(batch["b"], b[:2]) > 40


def test_loader_temporal_windows_stay_in_file(tmp_path):
    """Two clips in flat A/B folders: windows must never span files."""
    from ir2rgb_tpu.data.folder import find_temporal_sequences
    root, a, b = _avi_pair_root(tmp_path, n=5, two_clips=True)
    windows = find_temporal_sequences(root, "train", n_frames=3)
    assert len(windows) == 2 * (5 - 3 + 1)
    for w in windows:
        files = {split_virtual(pa)[0] for pa, _ in w}
        assert len(files) == 1


def test_loader_rejects_mixed_avi_resolutions(tmp_path):
    from ir2rgb_tpu.data import DataLoader
    root, _, _ = _avi_pair_root(tmp_path)
    _write(os.path.join(root, "A", "clip9.avi"), _frames(9, h=32, w=40))
    _write(os.path.join(root, "B", "clip9.avi"), _frames(9, h=32, w=40))
    with pytest.raises(ValueError, match="uniform native resolution"):
        DataLoader(_cfg(root), phase="train", shuffle=False)


# ------------------------------------------------------------------- e2e


def test_infer_cli_avi_in_avi_out(tmp_path):
    """Video in -> video out: test.py on an AVI dataroot (single mode)
    produces a per-frame gallery with distinct filenames and an MJPEG
    AVI of the generated frames."""
    import torch

    import torch_refs
    from ir2rgb_tpu.obs.video import read_mjpeg_avi
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    root = str(tmp_path / "in")
    os.makedirs(root)
    _write(os.path.join(root, "cam.avi"), _frames(4, h=48, w=48))
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    ckpt = str(tmp_path / "latest_net_G.pth")
    torch.save(t.state_dict(), ckpt)
    avi_out = str(tmp_path / "out.avi")
    out = subprocess.run(
        [sys.executable, "test.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", root, "--data.dataset_mode", "single",
         "--data.load_size", "48", "--data.crop_size", "32",
         "--train.name", "cli_avi",
         "--infer.results_dir", str(tmp_path / "results"),
         "--infer.video", avi_out, "--infer.video_fps", "25",
         "--torch_g", ckpt],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    back, fps = read_mjpeg_avi(avi_out)
    assert back.shape == (4, 32, 32, 3)
    assert fps == 25.0
    gallery = tmp_path / "results" / "cli_avi" / "test_latest" / "images"
    pngs = sorted(p.name for p in gallery.glob("*generated*"))
    assert len(pngs) == 4  # distinct names per frame (no '#' collisions)
    assert all("#" not in p for p in pngs)


def test_id_maps_refuse_avi_frames(clip):
    path, _ = clip
    with pytest.raises(ValueError, match="id maps cannot come from"):
        native.decode_ids_batch([f"{path}#000000"], 32, 32)


def test_hash_named_plain_image_decodes(tmp_path):
    """A plain image whose NAME contains '#' must decode normally (the
    virtual-path dispatch must not recurse or misroute it)."""
    img = _frames(1)[0]
    p = str(tmp_path / "frame#1.png")
    native.encode_png(p, img)
    out = native.decode_batch([p], *img.shape[:2])
    assert np.array_equal(out[0], img)


def test_audio_first_avi_indexes_video_stream(clip, tmp_path):
    """Camera AVIs often carry an audio track, sometimes listed FIRST:
    the index must find the 'vids' stream (chunk ids '01dc'), take fps
    and geometry from IT, and skip the audio chunks."""
    from ir2rgb_tpu.obs.video import _chunk, _list
    path, frames = clip
    h, w = frames.shape[1:3]
    # audio strl: 'auds' strh (rate 44100 — must NOT become fps) + strf
    auds_strh = struct.pack(
        "<4s4s10I4h", b"auds", b"\x00" * 4, 0, 0, 0,
        1, 44100, 0, 44100, 0, 0xFFFFFFFF, 2, 0, 0, 0, 0)
    auds_strf = struct.pack("<2H2I2H", 1, 1, 44100, 88200, 2, 16)
    vids_strh = struct.pack(
        "<4s4s10I4h", b"vids", b"MJPG", 0, 0, 0,
        1, 20, 0, len(frames), 0, 0xFFFFFFFF, 0, 0, 0, w, h)
    vids_strf = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D, w * h * 3,
        0, 0, 0, 0)
    avih = struct.pack("<14I", 50000, 0, 0, 0x10, len(frames), 0, 2,
                       0, w, h, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", auds_strh)
                         + _chunk(b"strf", auds_strf))
                 + _list(b"strl", _chunk(b"strh", vids_strh)
                         + _chunk(b"strf", vids_strf)))
    movi_payload = b"movi"
    entries = []
    for i, fr in enumerate(frames):
        if i % 2 == 0:  # interleave fake audio chunks
            movi_payload += _chunk(b"00wb", b"\x00" * 10)
        off = len(movi_payload)
        jpg = native.encode_jpeg(fr, 95)
        entries.append((b"01dc", off, len(jpg)))
        movi_payload += _chunk(b"01dc", jpg)
    idx1 = b"".join(b"%s%s" % (ck, struct.pack("<3I", 0x10, off, sz))
                    for ck, off, sz in entries)
    body = hdrl + b"LIST" + struct.pack(
        "<I", len(movi_payload)) + movi_payload + _chunk(b"idx1", idx1)
    data = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    p2 = str(tmp_path / "withaudio.avi")
    open(p2, "wb").write(data)

    idx = avi_index(p2)
    assert idx.n == len(frames)
    assert idx.fps == 20.0           # from the vids strh, not 44100
    assert idx.hw == (h, w)
    dec = decode_mixed_batch(frame_paths(p2)[:3], h, w)
    assert _psnr(dec, frames[:3]) > 35


def test_infer_cli_multi_avi_suffixed_outputs(tmp_path):
    """Two source videos with --infer.video: first file at the exact
    path, second suffixed with the container basename (no double
    extension), carry reset at the boundary."""
    import torch

    import torch_refs
    from ir2rgb_tpu.obs.video import read_mjpeg_avi
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    root = str(tmp_path / "in")
    os.makedirs(root)
    _write(os.path.join(root, "cam1.avi"), _frames(3, h=48, w=48))
    _write(os.path.join(root, "cam2.avi"), _frames(2, h=48, w=48))
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    ckpt = str(tmp_path / "latest_net_G.pth")
    torch.save(t.state_dict(), ckpt)
    avi_out = str(tmp_path / "out" / "gen.avi")
    out = subprocess.run(
        [sys.executable, "test.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", root, "--data.dataset_mode", "single",
         "--data.load_size", "48", "--data.crop_size", "32",
         "--train.name", "cli_avi2",
         "--infer.results_dir", str(tmp_path / "results"),
         "--infer.video", avi_out,
         "--torch_g", ckpt],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    first, _ = read_mjpeg_avi(avi_out)
    second, _ = read_mjpeg_avi(str(tmp_path / "out" / "gen_cam2.avi"))
    assert first.shape[0] == 3 and second.shape[0] == 2


def test_avi_roundtrip_fuzz_geometries(tmp_path):
    """Writer->index->decode across odd/tiny geometries and frame
    counts (exercises RIFF even-padding when a JPEG payload is odd)."""
    rng = np.random.RandomState(0)
    for trial, (h, w, n) in enumerate([(1, 1, 1), (3, 5, 2), (17, 13, 4),
                                       (24, 31, 7), (63, 1, 3)]):
        frames = (rng.rand(n, h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"f{trial}.avi")
        _write(p, frames, quality=90)
        idx = avi_index(p)
        assert idx.n == n, (h, w, n)
        dec = decode_mixed_batch(frame_paths(p), h, w)
        assert dec.shape == (n, h, w, 3)


def test_avi_parser_rejects_garbage(tmp_path):
    """Random bytes behind a RIFF/AVI magic must error, not hang or
    index garbage silently."""
    rng = np.random.RandomState(1)
    for trial in range(8):
        junk = rng.bytes(rng.randint(20, 4000))
        data = b"RIFF" + struct.pack("<I", len(junk) + 4) + b"AVI " + junk
        p = str(tmp_path / f"junk{trial}.avi")
        open(p, "wb").write(data)
        with pytest.raises((ValueError, struct.error)):
            avi_index(p)
