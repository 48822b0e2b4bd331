"""ir2rgb-info inspection CLI (cli/info.py): every artifact kind."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from ir2rgb_tpu.cli.info import inspect_path


def test_inspect_video(tmp_path):
    from ir2rgb_tpu.obs.video import MJPEGAviWriter
    p = str(tmp_path / "c.avi")
    with MJPEGAviWriter(p, fps=25) as w:
        for _ in range(5):
            w.add(np.zeros((32, 48, 3), np.uint8))
    info = inspect_path(p)
    assert info["kind"] == "video"
    assert info["frames"] == 5 and info["fps"] == 25.0
    assert info["frame_hw"] == [32, 48]
    assert info["duration_s"] == 0.2


def test_inspect_torch_checkpoint(tmp_path):
    import torch

    import torch_refs
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    p = str(tmp_path / "G.pth")
    torch.save(t.state_dict(), p)
    info = inspect_path(p)
    assert info["kind"] == "torch_checkpoint"
    assert info["conv_layers"] > 10
    assert info["parameters"] > 1000


def test_inspect_artifacts(tmp_path):
    from ir2rgb_tpu.config import Config, DataConfig, LossConfig, \
        ModelConfig, TrainConfig
    from ir2rgb_tpu.infer import export_multistream_artifact, \
        export_serving_artifact
    from ir2rgb_tpu.train import create_model
    cfg = Config(model=ModelConfig(model="pix2pix",
                                   net_g="resnet_6blocks", ngf=8, ndf=8),
                 data=DataConfig(crop_size=32),
                 loss=LossConfig(no_vgg_loss=True), train=TrainConfig())
    model = create_model(cfg, steps_per_epoch=1)
    g = model.g_init(jax.random.PRNGKey(0))
    single = str(tmp_path / "s.ir2rgb")
    multi = str(tmp_path / "m.ir2rgb")
    export_serving_artifact(model, g, (32, 32), single, platforms=("cpu",))
    export_multistream_artifact(model, g, (32, 32), multi, n_slots=2,
                                platforms=("cpu",))
    si = inspect_path(single)
    assert si["artifact_kind"] == "single-stream" and si["batch"] == 1
    assert si["frame_hw"] == [32, 32] and si["params"] > 10
    mi = inspect_path(multi)
    assert mi["artifact_kind"] == "multistream" and mi["slots"] == 2


def test_inspect_run_dir_and_cli(tmp_path):
    """Train a tiny run, then inspect it through the real CLI."""
    from ir2rgb_tpu.data import write_synthetic_dataset
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    root = str(tmp_path / "data")
    write_synthetic_dataset(root, n=4, size=48)
    ckpts = str(tmp_path / "ckpts")
    out = subprocess.run(
        [sys.executable, "train.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--model.ndf", "8", "--loss.no_vgg_loss", "true",
         "--data.dataroot", root, "--data.load_size", "48",
         "--data.crop_size", "32", "--data.batch_size", "2",
         "--train.num_devices", "2",
         "--train.name", "inforun", "--train.checkpoints_dir", ckpts,
         "--train.niter", "1", "--train.niter_decay", "0"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    run_dir = os.path.join(ckpts, "inforun")
    out = subprocess.run(
        [sys.executable, "-m", "ir2rgb_tpu.cli.info", "--json", run_dir],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout)
    assert info["kind"] == "run_dir"
    assert info["model"]["net_g"] == "resnet_6blocks"
    assert len(info["checkpoint_steps"]) >= 1
    assert info["loss_log_lines"] >= 1


def test_inspect_unknown_kind(tmp_path):
    p = str(tmp_path / "x.txt")
    open(p, "w").write("hi")
    with pytest.raises(SystemExit, match="don't know how"):
        inspect_path(p)


def test_inspect_plain_directory_rejected(tmp_path):
    d = str(tmp_path / "notarun")
    os.makedirs(d)
    with pytest.raises(SystemExit, match="not an ir2rgb run dir"):
        inspect_path(d)


def test_inspect_full_module_pickle_rejected(tmp_path):
    """A whole pickled nn.Module (torch.save(model)) must produce a
    clean refusal, not a raw UnpicklingError — unpickling it would
    execute arbitrary code, which an inspection tool must never do."""
    import torch
    p = str(tmp_path / "model.pth")
    torch.save(torch.nn.Linear(2, 2), p)
    with pytest.raises(SystemExit, match="not a plain state_dict"):
        inspect_path(p)


def test_inspect_non_dict_pickle_rejected(tmp_path):
    import torch
    p = str(tmp_path / "list.pth")
    torch.save([1, 2, 3], p)
    with pytest.raises(SystemExit, match="not a state_dict"):
        inspect_path(p)
