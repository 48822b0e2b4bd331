"""Streaming-inference integration tests (SURVEY.md §4.5): temporal carry
dependence, scan-vs-loop equivalence, metrics sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.infer import (
    StreamingGenerator,
    flicker,
    psnr,
    ssim,
    tensor2im,
    translate_clip,
)
from ir2rgb_tpu.train import create_model


def _temporal_model():
    cfg = Config(
        model=ModelConfig(model="temporal", net_g="resnet_6blocks",
                          net_d="n_layers", ngf=8, ndf=8, n_frames_g=2),
        data=DataConfig(crop_size=32),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(),
    )
    model = create_model(cfg, steps_per_epoch=10)
    g_params = model.g_init(jax.random.PRNGKey(0))
    return model, g_params


def test_stream_frame_depends_on_previous():
    """Perturbation test: changing frame t-1 must change frame t's output
    (the prev-frame conditioning is live)."""
    model, g_params = _temporal_model()
    frames = [jax.random.uniform(jax.random.PRNGKey(i), (1, 32, 32, 3),
                                 jnp.float32, -1, 1) for i in range(3)]

    s1 = StreamingGenerator(model, g_params, (32, 32))
    outs1 = [np.asarray(s1.push_device(jnp.array(f))) for f in frames]

    s2 = StreamingGenerator(model, g_params, (32, 32))
    # NB: a constant shift would be erased by the first instance norm;
    # perturb with structured noise instead
    noise = jax.random.normal(jax.random.PRNGKey(99), frames[1].shape)
    frames2 = [frames[0], frames[1] + 0.5 * noise, frames[2]]
    outs2 = [np.asarray(s2.push_device(jnp.array(f))) for f in frames2]

    # frame 0 identical; frame 1 (perturbed input) clearly differs;
    # frame 2 (same input, different history) differs via the carry
    np.testing.assert_array_equal(outs1[0], outs2[0])
    assert np.abs(outs1[1] - outs2[1]).max() > 1e-3
    assert np.abs(outs1[2] - outs2[2]).max() > 1e-6


def test_stream_matches_scan():
    model, g_params = _temporal_model()
    a_seq = jax.random.uniform(jax.random.PRNGKey(9), (4, 1, 32, 32, 3),
                               jnp.float32, -1, 1)
    scan_out = np.asarray(translate_clip(model, g_params, a_seq))

    stream = StreamingGenerator(model, g_params, (32, 32))
    loop_out = np.stack([np.asarray(stream.push_device(jnp.array(a_seq[t])))
                         for t in range(4)])
    np.testing.assert_allclose(loop_out, scan_out, atol=1e-5)


def test_reset_clears_history():
    model, g_params = _temporal_model()
    f = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                           jnp.float32, -1, 1)
    s = StreamingGenerator(model, g_params, (32, 32))
    first = np.asarray(s.push_device(jnp.array(f)))
    s.push_device(jnp.array(f))
    s.reset()
    again = np.asarray(s.push_device(jnp.array(f)))
    np.testing.assert_array_equal(first, again)


def test_tensor2im_roundtrip():
    x = jnp.asarray(np.linspace(-1, 1, 48).reshape(1, 4, 4, 3),
                    jnp.float32)
    img = tensor2im(x)
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255


def test_psnr_ssim_sanity():
    a = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    assert float(psnr(a, a)) > 80
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    noisy = a + 0.1
    assert float(psnr(a, noisy)) == pytest.approx(
        10 * np.log10(4 / 0.01), rel=1e-3)
    assert float(ssim(a, noisy)) < 1.0


def test_flicker_metric():
    static = jnp.zeros((5, 8, 8, 3))
    moving = jnp.asarray(np.random.RandomState(0).rand(5, 8, 8, 3))
    assert float(flicker(static)) == 0.0
    assert float(flicker(moving)) > 0.1


def test_pipelined_stream_matches_sequential_push():
    """StreamingGenerator.stream (depth-1 software pipeline: H2D +
    dispatch of frame t before the D2H of frame t-1) must produce
    exactly the same frames as sequential push() calls."""
    model, g_params = _temporal_model()
    rng = np.random.RandomState(7)
    frames = [rng.rand(32, 32, 3).astype(np.float32) * 2 - 1
              for _ in range(5)]

    s1 = StreamingGenerator(model, g_params, (32, 32))
    seq = [s1.push(f) for f in frames]

    s2 = StreamingGenerator(model, g_params, (32, 32))
    piped = list(s2.stream(frames))

    assert len(piped) == len(seq)
    for a, b in zip(seq, piped):
        np.testing.assert_array_equal(a, b)


def test_uint8_wire_path_matches_host_conversion():
    """uint8 ingest (normalize/quantize on device, uint8 over the wire
    both ways) must match the host-side float path within 1 LSB (the
    f32->uint8 cast may round differently on device)."""
    model, g_params = _temporal_model()
    rng = np.random.RandomState(3)
    frames_u8 = [(rng.rand(32, 32, 3) * 255).astype(np.uint8)
                 for _ in range(3)]

    s_u8 = StreamingGenerator(model, g_params, (32, 32))
    out_u8 = [s_u8.push(f) for f in frames_u8]

    s_f = StreamingGenerator(model, g_params, (32, 32))
    out_f = [s_f.push(f.astype(np.float32) / 127.5 - 1.0)
             for f in frames_u8]

    for a, b in zip(out_u8, out_f):
        assert a.dtype == np.uint8 and b.dtype == np.uint8
        assert np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))) <= 1

    # pipelined uint8 stream == sequential uint8 pushes, exactly
    s2 = StreamingGenerator(model, g_params, (32, 32))
    for a, b in zip(out_u8, s2.stream(frames_u8)):
        np.testing.assert_array_equal(a, b)


def test_tensor2im_keeps_multiframe_batch():
    """B>1 batches must come back whole — squeezing to frame 0 silently
    drops the other streams' outputs (multi-stream serving)."""
    x = jnp.zeros((3, 8, 8, 3), jnp.float32)
    img = tensor2im(x)
    assert img.shape == (3, 8, 8, 3) and img.dtype == np.uint8
    # batch-1 still squeezes to HWC (reference util.tensor2im contract)
    assert tensor2im(x[:1]).shape == (8, 8, 3)
