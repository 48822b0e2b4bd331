"""CLI end-to-end tests on CPU (the TPU drives live in
.claude/skills/verify/SKILL.md): torch-checkpoint parity mode through
test.py, the convert CLI, and the evaluate CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import torch_refs


@pytest.fixture(scope="module")
def env():
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    e["PYTHONPATH"] = "/root/repo"
    return e


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from ir2rgb_tpu.data import write_synthetic_dataset
    root = str(tmp_path_factory.mktemp("cli_data"))
    write_synthetic_dataset(root, n=4, size=48)
    return root


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    path = str(tmp_path_factory.mktemp("ckpt") / "latest_net_G.pth")
    torch.save(t.state_dict(), path)
    return path


def test_infer_cli_torch_g_parity_mode(env, dataset, torch_ckpt, tmp_path):
    """The reference-checkpoint on-ramp: test.py --torch_g runs the
    imported generator over a folder and reports PSNR/SSIM."""
    out = subprocess.run(
        [sys.executable, "test.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", dataset, "--data.load_size", "48",
         "--data.crop_size", "32",
         "--train.name", "cli_parity",
         "--infer.results_dir", str(tmp_path / "results"),
         "--infer.how_many", "2",
         "--torch_g", torch_ckpt],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PSNR" in out.stdout
    gallery = tmp_path / "results" / "cli_parity" / "test_latest"
    assert (gallery / "index.html").exists()
    pngs = list((gallery / "images").glob("*.png"))
    assert len(pngs) == 6  # 2 frames x (input, generated, target)


def test_convert_cli_roundtrip(env, torch_ckpt, tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "ir2rgb_tpu.cli.convert", "g",
         "--pth", torch_ckpt, "--preset", "resnet9_256",
         "--out", str(tmp_path / "imported")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    # resnet9_256 expects 9 blocks but the ckpt has 6 -> clean error
    assert out.returncode != 0
    assert "conv count mismatch" in (out.stderr + out.stdout)


def test_evaluate_cli(env, dataset, tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "ir2rgb_tpu.cli.evaluate",
         "--generated", os.path.join(dataset, "B"),
         "--target", os.path.join(dataset, "B"),
         "--json_out", str(tmp_path / "eval.json")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads((tmp_path / "eval.json").read_text())
    assert result["frames"] == 4
    assert result["psnr_mean"] > 60  # identical folders
    assert result["ssim_mean"] == pytest.approx(1.0, abs=1e-4)


def test_train_cli_instance_features(env, tmp_path):
    """End-to-end --model.use_instance_feat training: instance maps load
    from trainInst/, flow through the paired transform, and netE trains
    inside the fused step (pix2pixHD --instance_feat surface)."""
    from PIL import Image

    root = tmp_path / "featds"
    for sub in ("trainA", "trainB", "trainInst"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        for sub in ("trainA", "trainB"):
            Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)
                            ).save(root / sub / f"{i:03d}.png")
        Image.fromarray((np.arange(48 * 48).reshape(48, 48) // 600
                         ).astype(np.uint8)).save(
            root / "trainInst" / f"{i:03d}.png")

    ckpts = str(tmp_path / "ckpts")
    rc = subprocess.run(
        [sys.executable, "train.py", "--preset", "pix2pixhd_512",
         "--model.ngf", "4", "--model.ndf", "8",
         "--model.n_downsample_global", "2", "--model.n_blocks_global", "1",
         "--model.n_blocks_local", "1",
         "--model.use_instance_feat", "true", "--model.nef", "4",
         "--model.n_downsample_e", "2",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", str(root), "--data.load_size", "48",
         "--data.crop_size", "32", "--data.batch_size", "2",
         "--train.name", "feat_run", "--train.checkpoints_dir", ckpts,
         "--train.num_devices", "2",
         "--train.niter", "1", "--train.niter_decay", "0",
         "--train.niter_fix_global", "0", "--train.print_freq", "2"],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr[-2000:]
    log = os.path.join(ckpts, "feat_run", "loss_log.txt")
    assert os.path.exists(log)
    assert "G_GAN" in open(log).read()


def test_train_and_infer_cli_label_nc(env, tmp_path):
    """Reference-style --label_nc launch end-to-end: semantic label maps
    (class-id PNGs in trainA/testA) train through the one-hot
    encode_input path, then test.py infers from the run checkpoint and
    writes a palette-colorized gallery."""
    from PIL import Image

    root = tmp_path / "labelds"
    rng = np.random.RandomState(0)
    for phase in ("train", "test"):
        (root / f"{phase}A").mkdir(parents=True)
        (root / f"{phase}B").mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.randint(0, 5, (48, 48)).astype(np.uint8)
                            ).save(root / f"{phase}A" / f"{i:03d}.png")
            Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)
                            ).save(root / f"{phase}B" / f"{i:03d}.png")

    ckpts = str(tmp_path / "ckpts")
    rc = subprocess.run(
        [sys.executable, "train.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "4",
         "--model.ndf", "8",
         "--label_nc", "5",                      # reference spelling
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", str(root), "--data.load_size", "48",
         "--data.crop_size", "32", "--data.batch_size", "2",
         "--train.name", "label_run", "--train.checkpoints_dir", ckpts,
         "--train.num_devices", "2",
         "--train.niter", "1", "--train.niter_decay", "0",
         "--train.print_freq", "2"],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr[-2000:]
    assert "G_GAN" in open(
        os.path.join(ckpts, "label_run", "loss_log.txt")).read()

    out = subprocess.run(
        [sys.executable, "test.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "4",
         "--model.ndf", "8", "--label_nc", "5",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", str(root), "--data.load_size", "48",
         "--data.crop_size", "32",
         "--train.name", "label_run", "--train.checkpoints_dir", ckpts,
         "--infer.results_dir", str(tmp_path / "results"),
         "--infer.how_many", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PSNR" in out.stdout
    gallery = tmp_path / "results" / "label_run" / "test_latest"
    assert (gallery / "index.html").exists()
    # input panels are palette-colorized RGB, not raw near-black ids
    inputs = sorted((gallery / "images").glob("*input*.png"))
    assert inputs, "gallery wrote no input panels"
    arr = np.asarray(Image.open(inputs[0]).convert("RGB"))
    assert arr.max() > 32, "label input panel looks like raw ids, " \
                           "not the Colorize palette"


def test_evaluate_cli_all_pairs_skipped_fails(tmp_path):
    """Every pair shape-mismatched -> exit 1 with a message, not NaN
    JSON with exit 0."""
    from PIL import Image

    from ir2rgb_tpu.cli.evaluate import main as eval_main

    gen, tgt = tmp_path / "gen", tmp_path / "tgt"
    gen.mkdir(); tgt.mkdir()
    for i in range(3):
        Image.new("RGB", (16, 16)).save(gen / f"{i}.png")
        Image.new("RGB", (24, 24)).save(tgt / f"{i}.png")
    rc = eval_main(["--generated", str(gen), "--target", str(tgt)])
    assert rc == 1


def test_convert_cli_export_g_deploys_to_torch(env, dataset, tmp_path):
    """Close the migration loop e2e: train a tiny run, export its G with
    `convert export-g` (architecture from the run's config.json), load
    the .pth strict into the reference-family torch module."""
    ckpts = str(tmp_path / "ckpts")
    out = subprocess.run(
        [sys.executable, "train.py", "--preset", "pix2pix_unet256",
         "--model.net_g", "resnet_6blocks",
         "--data.dataroot", dataset, "--data.load_size", "48",
         "--data.crop_size", "32", "--data.batch_size", "2",
         "--model.ngf", "8", "--model.ndf", "8",
         "--train.name", "exp_export", "--train.checkpoints_dir", ckpts,
         "--train.num_devices", "2",
         "--train.niter", "1", "--train.niter_decay", "0"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    t = torch_refs.ResnetGenerator(ngf=8, n_blocks=6, norm="instance")
    template = str(tmp_path / "template_net_G.pth")
    torch.save(t.state_dict(), template)

    exported = str(tmp_path / "trained_net_G.pth")
    out = subprocess.run(
        [sys.executable, "-m", "ir2rgb_tpu.cli.convert", "export-g",
         "--run", os.path.join(ckpts, "exp_export"),
         "--template", template, "--out", exported],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "exported" in out.stdout

    sd = torch.load(exported, map_location="cpu", weights_only=True)
    t.load_state_dict(sd, strict=True)  # raises on any name/shape drift
    # trained weights, not the template's initialization
    assert not np.allclose(
        sd["model.1.weight"].numpy(),
        torch_refs.ResnetGenerator(ngf=8, n_blocks=6,
                                   norm="instance").state_dict()
        ["model.1.weight"].numpy())


def test_feature_workflow_e2e(env, tmp_path):
    """The pix2pixHD feature workflow end-to-end: train a tiny
    use_instance_feat run, precompute + cluster its instance styles,
    then infer with --cluster_path (sampled styles) and
    --use_encoded_image (real-image styles)."""
    from PIL import Image

    root = tmp_path / "featds"
    rng = np.random.RandomState(0)
    for phase in ("train", "test"):
        for sub in (f"{phase}A", f"{phase}B", f"{phase}Inst"):
            (root / sub).mkdir(parents=True)
        for i in range(4):
            for sub in (f"{phase}A", f"{phase}B"):
                Image.fromarray((rng.rand(48, 48, 3) * 255).astype(
                    np.uint8)).save(root / sub / f"{i:03d}.png")
            Image.fromarray((np.arange(48 * 48).reshape(48, 48) // 600
                             ).astype(np.uint8)).save(
                root / f"{phase}Inst" / f"{i:03d}.png")

    ckpts = str(tmp_path / "ckpts")
    common = ["--preset", "pix2pixhd_512",
              "--model.ngf", "4", "--model.ndf", "8",
              "--model.n_downsample_global", "2",
              "--model.n_blocks_global", "1", "--model.n_blocks_local", "1",
              "--model.use_instance_feat", "true", "--model.nef", "4",
              "--model.n_downsample_e", "2",
              "--model.use_instance_edges", "true",
              "--loss.no_vgg_loss", "true",
              "--data.dataroot", str(root), "--data.load_size", "48",
              "--data.crop_size", "32",
              "--train.name", "featflow", "--train.checkpoints_dir", ckpts]
    rc = subprocess.run(
        [sys.executable, "train.py", *common,
         "--data.batch_size", "2", "--train.num_devices", "2",
         "--train.niter", "1", "--train.niter_decay", "0",
         "--train.niter_fix_global", "0"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert rc.returncode == 0, rc.stderr[-2000:]

    clusters = str(tmp_path / "feats.npz")
    rc = subprocess.run(
        [sys.executable, "-m", "ir2rgb_tpu.cli.precompute_feats", *common,
         "--infer.n_clusters", "4", "--out", clusters],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert rc.returncode == 0, rc.stderr[-2000:]
    assert "centers" in rc.stdout and os.path.exists(clusters)

    for extra in (["--infer.cluster_path", clusters],
                  ["--infer.use_encoded_image", "true"]):
        rc = subprocess.run(
            [sys.executable, "test.py", *common,
             "--infer.results_dir", str(tmp_path / "results"),
             "--infer.how_many", "2", *extra],
            cwd="/root/repo", env=env, capture_output=True, text=True,
            timeout=600)
        assert rc.returncode == 0, (extra, rc.stderr[-2000:])
        assert "PSNR" in rc.stdout


def test_infer_cli_single_mode(env, torch_ckpt, tmp_path):
    """test.py over an input-only folder (--dataset_mode single):
    gallery has input+generated only, no PSNR line, clean exit."""
    from PIL import Image

    root = tmp_path / "onlyA"
    (root / "testA").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)
                        ).save(root / "testA" / f"{i}.png")
    out = subprocess.run(
        [sys.executable, "test.py",
         "--model.net_g", "resnet_6blocks", "--model.ngf", "8",
         "--loss.no_vgg_loss", "true",
         "--data.dataroot", str(root), "--data.load_size", "48",
         "--data.crop_size", "32", "--data.dataset_mode", "single",
         "--train.name", "single_run",
         "--infer.results_dir", str(tmp_path / "results"),
         "--torch_g", torch_ckpt],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "single mode" in out.stdout and "PSNR:" not in out.stdout
    gallery = tmp_path / "results" / "single_run" / "test_latest"
    pngs = list((gallery / "images").glob("*.png"))
    assert len(pngs) == 6  # 3 frames x (input, generated) — no target
