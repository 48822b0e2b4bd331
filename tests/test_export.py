"""Serving-artifact tests: export/load round-trips must match the live
StreamingGenerator path exactly, artifacts must be self-describing
(format version, geometry), and the CLI must export from a run
checkpoint."""

import os
import zipfile

import jax
import numpy as np
import pytest

from ir2rgb_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig
from ir2rgb_tpu.infer import (
    StreamingGenerator,
    export_serving_artifact,
    load_serving_artifact,
)
from ir2rgb_tpu.train import create_model


def _model(temporal=True):
    cfg = Config(
        model=ModelConfig(model="temporal" if temporal else "pix2pix",
                          net_g="resnet_6blocks", net_d="n_layers",
                          ngf=8, ndf=8, n_frames_g=2),
        data=DataConfig(crop_size=32),
        loss=LossConfig(no_vgg_loss=True),
        train=TrainConfig(),
    )
    model = create_model(cfg, steps_per_epoch=10)
    return model, model.g_init(jax.random.PRNGKey(0))


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(n)]


def test_temporal_artifact_matches_live_path(tmp_path):
    """Exported step == live step bit-for-bit on the same backend,
    including the carry thread and reset()."""
    model, g = _model()
    path = str(tmp_path / "m.ir2rgb")
    export_serving_artifact(model, g, (32, 32), path,
                            platforms=("cpu",))

    live = StreamingGenerator(model, g, (32, 32))
    art = load_serving_artifact(path)
    frames = _frames(4)
    for f in frames:
        np.testing.assert_array_equal(art.push(f), live.push(f))

    # reset starts a fresh temporal context on both
    live2 = StreamingGenerator(model, g, (32, 32))
    art.reset()
    np.testing.assert_array_equal(art.push(frames[0]),
                                  live2.push(frames[0]))

    # pipelined stream == sequential pushes
    art.reset()
    seq = [load_serving_artifact(path).push(frames[0])]
    piped = list(art.stream(frames))
    np.testing.assert_array_equal(piped[0], seq[0])
    assert len(piped) == len(frames)


def test_single_frame_artifact(tmp_path):
    model, g = _model(temporal=False)
    path = str(tmp_path / "m.ir2rgb")
    export_serving_artifact(model, g, (32, 32), path, platforms=("cpu",))
    live = StreamingGenerator(model, g, (32, 32))
    art = load_serving_artifact(path)
    assert not art.temporal
    for f in _frames(2, seed=5):
        np.testing.assert_array_equal(art.push(f), live.push(f))


def test_artifact_is_self_contained(tmp_path):
    """Loading needs only the file — weights live inside (f32-stored,
    cast back to the recorded dtype) and meta describes the geometry."""
    model, g = _model()
    path = str(tmp_path / "m.ir2rgb")
    export_serving_artifact(model, g, (32, 32), path, platforms=("cpu",))
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert "program.bin" in names and "meta.json" in names
    assert any(n.startswith("param_") for n in names)
    art = load_serving_artifact(path)
    assert art.meta["frame_hw"] == [32, 32]
    assert art.meta["temporal"] is True
    n_leaves = len(jax.tree.leaves(g))
    assert len(art.meta["param_paths"]) == n_leaves


def test_format_version_guard(tmp_path):
    model, g = _model(temporal=False)
    path = str(tmp_path / "m.ir2rgb")
    export_serving_artifact(model, g, (32, 32), path, platforms=("cpu",))
    # rewrite meta with a bogus version
    import json
    with zipfile.ZipFile(path) as zf:
        data = {n: zf.read(n) for n in zf.namelist()}
    meta = json.loads(data["meta.json"])
    meta["format_version"] = 999
    data["meta.json"] = json.dumps(meta).encode()
    with zipfile.ZipFile(path, "w") as zf:
        for n, b in data.items():
            zf.writestr(n, b)
    with pytest.raises(ValueError, match="format"):
        load_serving_artifact(path)


def test_batched_export_geometry(tmp_path):
    """batch>1 artifacts serve multi-stream-shaped batches."""
    model, g = _model()
    path = str(tmp_path / "m.ir2rgb")
    export_serving_artifact(model, g, (32, 32), path, batch=2,
                            platforms=("cpu",))
    art = load_serving_artifact(path)
    batch = np.stack(_frames(2, seed=9))
    out = art.push(batch)
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.uint8


def test_export_cli_from_checkpoint(tmp_path):
    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.cli.export import main as export_main

    model, g = _model()
    ckpt_dir = tmp_path / "ckpts" / "runx"
    mgr = CheckpointManager(str(ckpt_dir / "ckpt"))
    mgr.save(0, {"g_params": jax.device_get(g)}, force=True)
    mgr.close()

    out = str(tmp_path / "runx.ir2rgb")
    rc = export_main([
        "--model.model", "temporal", "--model.net_g", "resnet_6blocks",
        "--model.net_d", "n_layers", "--model.ngf", "8",
        "--model.ndf", "8", "--model.n_frames_g", "2",
        "--data.crop_size", "32", "--loss.no_vgg_loss", "true",
        "--train.name", "runx",
        "--train.checkpoints_dir", str(tmp_path / "ckpts"),
        "--out", out, "--platforms", "cpu",
    ])
    assert rc == 0 and os.path.exists(out)
    art = load_serving_artifact(out)
    live = StreamingGenerator(model, g, (32, 32))
    f = _frames(1, seed=3)[0]
    np.testing.assert_array_equal(art.push(f), live.push(f))


def test_export_cli_size_flag_and_noncrop_guard(tmp_path):
    """Non-crop preprocess has no static geometry export can infer:
    it must demand --size, and --size HxW must seal that geometry."""
    from ir2rgb_tpu.checkpoint import CheckpointManager
    from ir2rgb_tpu.cli.export import main as export_main

    model, g = _model()
    ckpt_dir = tmp_path / "ckpts" / "runsz"
    mgr = CheckpointManager(str(ckpt_dir / "ckpt"))
    mgr.save(0, {"g_params": jax.device_get(g)}, force=True)
    mgr.close()

    common = [
        "--model.model", "temporal", "--model.net_g", "resnet_6blocks",
        "--model.net_d", "n_layers", "--model.ngf", "8",
        "--model.ndf", "8", "--model.n_frames_g", "2",
        "--data.preprocess", "none", "--loss.no_vgg_loss", "true",
        "--train.name", "runsz",
        "--train.checkpoints_dir", str(tmp_path / "ckpts"),
        "--platforms", "cpu",
    ]
    with pytest.raises(SystemExit, match="--size"):
        export_main(common + ["--out", str(tmp_path / "x.ir2rgb")])

    out = str(tmp_path / "sized.ir2rgb")
    rc = export_main(common + ["--out", out, "--size", "32x64"])
    assert rc == 0
    art = load_serving_artifact(out)
    frame = (np.random.RandomState(0).rand(32, 64, 3) * 255
             ).astype(np.uint8)
    assert art.push(frame).shape == (32, 64, 3)


def test_export_refuses_feature_conditioned_models(tmp_path):
    """A sealed artifact would bake the zeros feature prior in and
    silently drop style control — exporting such a model must fail."""
    import dataclasses

    import pytest

    from ir2rgb_tpu.config import PRESETS
    from ir2rgb_tpu.infer.export import export_serving_artifact
    from ir2rgb_tpu.train import create_model

    cfg = PRESETS["pix2pixhd_512"]
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, ngf=4, ndf=4, n_downsample_global=2, n_blocks_global=1,
        n_blocks_local=1, use_instance_feat=True, nef=4, n_downsample_e=2))
    model = create_model(cfg, steps_per_epoch=10)
    g = model.g_init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="instance maps"):
        export_serving_artifact(model, g, (32, 32),
                                str(tmp_path / "m.ir2rgb"))
