"""The native TensorBoard event writer (obs/tb.py) must produce files
the REAL tensorboard reader accepts — TFRecord framing, masked CRC32C,
and the Event/Summary protobuf subset are all hand-rolled, so parse the
output back with tensorboard's event_accumulator (available in this
image; the writer itself has no such dependency). SURVEY.md §5 metrics
row (round-2 verdict missing #4)."""

import os
import struct

import numpy as np
import pytest

from ir2rgb_tpu.obs.tb import TBEventWriter, _masked_crc, crc32c

tb_ea = pytest.importorskip(
    "tensorboard.backend.event_processing.event_accumulator")


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_negative_step_varint_terminates(tmp_path):
    """A negative step (e.g. a -1 sentinel) must encode as protobuf's
    10-byte two's-complement varint, not hang — Python's sign-preserving
    >> made the raw loop infinite (review fix)."""
    from ir2rgb_tpu.obs.tb import _varint
    assert _varint(-1) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("x", 1.0, -1)  # must not hang
    w.close()
    acc = tb_ea.EventAccumulator(str(tmp_path))
    acc.Reload()
    assert acc.Scalars("x")[0].step == -1


def test_scalars_roundtrip_through_real_tensorboard(tmp_path):
    w = TBEventWriter(str(tmp_path))
    for step in range(5):
        w.add_scalars({"loss/G_GAN": 1.0 / (step + 1),
                       "loss/D_real": 0.5 * step}, step)
    w.add_scalar("perf/fps", 284.6, 100)
    w.close()

    acc = tb_ea.EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert set(tags) == {"loss/G_GAN", "loss/D_real", "perf/fps"}
    g = acc.Scalars("loss/G_GAN")
    assert [e.step for e in g] == list(range(5))
    np.testing.assert_allclose([e.value for e in g],
                               [1.0 / (s + 1) for s in range(5)],
                               rtol=1e-6)
    fps = acc.Scalars("perf/fps")
    assert fps[0].step == 100
    assert fps[0].value == pytest.approx(284.6, rel=1e-6)


def test_image_roundtrip(tmp_path):
    from PIL import Image
    import io

    img = np.zeros((8, 6, 3), np.uint8)
    img[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="png")

    w = TBEventWriter(str(tmp_path))
    w.add_image("gen/sample", buf.getvalue(), 8, 6, step=3)
    w.close()

    acc = tb_ea.EventAccumulator(
        str(tmp_path), size_guidance={tb_ea.IMAGES: 0})
    acc.Reload()
    assert "gen/sample" in acc.Tags()["images"]
    got = acc.Images("gen/sample")[0]
    assert got.step == 3
    back = np.asarray(Image.open(io.BytesIO(got.encoded_image_string)))
    np.testing.assert_array_equal(back, img)


def test_record_framing_is_valid(tmp_path):
    """Verify the TFRecord container byte-for-byte (independent of the
    tensorboard reader, which skips corrupt tails silently)."""
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("x", 1.5, 7)
    w.close()
    data = open(w.path, "rb").read()
    off, n_records = 0, 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        header = data[off:off + 8]
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(header)
        payload = data[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert pcrc == _masked_crc(payload)
        off += 12 + length + 4
        n_records += 1
    assert off == len(data)
    assert n_records == 2  # file_version event + the scalar


def test_visualizer_emits_tb_events(tmp_path):
    from ir2rgb_tpu.obs import Visualizer

    vis = Visualizer(str(tmp_path), "tbtest")
    vis.print_current_errors(1, 10, {"G_GAN": 0.25}, 0.01)
    vis.flush()
    tb_dir = os.path.join(str(tmp_path), "tb")
    files = os.listdir(tb_dir)
    assert any(f.startswith("events.out.tfevents.") for f in files)
    acc = tb_ea.EventAccumulator(tb_dir)
    acc.Reload()
    assert "loss/G_GAN" in acc.Tags()["scalars"]
    assert acc.Scalars("loss/G_GAN")[0].value == pytest.approx(0.25)
