"""Config system tests: CLI parsing, reference-flag translation, opt.txt
round-trip, JSON serialization (SURVEY.md §2.4 rebuild)."""

import pytest

from ir2rgb_tpu.config import (
    Config,
    PRESETS,
    from_reference_flags,
    load_config,
    parse_cli,
    save_config,
)
from ir2rgb_tpu.config.compat import parse_opt_txt


def test_parse_cli_overrides():
    cfg = parse_cli(["--preset", "pix2pix_unet256",
                     "--model.ngf", "32", "--data.batch_size", "4",
                     "--train.lr", "1e-3", "--data.no_flip", "true"])
    assert cfg.model.net_g == "unet_256"
    assert cfg.model.ngf == 32
    assert cfg.data.batch_size == 4
    assert cfg.train.lr == pytest.approx(1e-3)
    assert cfg.data.no_flip is True


def test_presets_cover_baseline_configs():
    # BASELINE.json's five configs (SURVEY.md §6)
    assert PRESETS["resnet9_256"].model.net_g == "resnet_9blocks"
    assert PRESETS["pix2pix_unet256"].model.net_g == "unet_256"
    assert PRESETS["pix2pixhd_512"].model.net_g == "local"
    assert PRESETS["pix2pixhd_512"].data.crop_size == 512
    assert PRESETS["temporal_256"].model.model == "temporal"
    assert PRESETS["pix2pixhd_1024"].data.crop_size == 1024
    assert PRESETS["pix2pixhd_1024"].model.num_d == 3
    assert PRESETS["pix2pixhd_2048"].model.n_local_enhancers == 2
    assert PRESETS["temporal_512"].model.model == "temporal"
    assert PRESETS["temporal_512"].model.net_g == "local"
    assert PRESETS["temporal_1024"].model.model == "temporal"
    assert PRESETS["temporal_1024"].data.crop_size == 1024
    assert PRESETS["temporal_1024"].model.num_d == 3


def test_reference_flag_translation():
    cfg = from_reference_flags({
        "name": "exp1", "batchSize": 8, "loadSize": 286, "fineSize": 256,
        "netG": "global", "ngf": 32, "niter": 50, "niter_decay": 50,
        "no_lsgan": True, "lambda_feat": 5.0, "nThreads": 4,
        "which_epoch": "latest", "no_flip": True,
    })
    assert cfg.train.name == "exp1"
    assert cfg.data.batch_size == 8
    assert cfg.data.load_size == 286
    assert cfg.data.crop_size == 256
    assert cfg.model.net_g == "global"
    assert cfg.loss.gan_mode == "vanilla"  # no_lsgan
    assert cfg.loss.lambda_feat == 5.0
    assert cfg.infer.which_epoch == "latest"


def test_reference_netE_and_dropout_flags():
    """netE (instance_feat/feat_num/nef/n_downsample_E) and the inverted
    no_dropout flag translate onto ModelConfig (round-3 gap: these were
    config-reachable but absent from the opt.txt migration table)."""
    cfg = from_reference_flags({
        "instance_feat": True, "feat_num": 4, "nef": 32,
        "n_downsample_E": 3, "no_dropout": False,
    })
    assert cfg.model.use_instance_feat is True
    assert cfg.model.feat_num == 4
    assert cfg.model.nef == 32
    assert cfg.model.n_downsample_e == 3
    assert cfg.model.use_dropout is True  # no_dropout=False -> dropout on
    cfg2 = from_reference_flags({"no_dropout": True})
    assert cfg2.model.use_dropout is False


def test_opt_txt_parse(tmp_path):
    opt = tmp_path / "opt.txt"
    opt.write_text(
        "------------ Options -------------\n"
        "batchSize: 1\n"
        "fineSize: 512 [default: 256]\n"
        "netG: local\n"
        "no_flip: False\n"
        "lr: 0.0002\n"
        "-------------- End ----------------\n")
    flags = parse_opt_txt(str(opt))
    assert flags["batchSize"] == 1
    assert flags["fineSize"] == 512  # default-annotation stripped
    assert flags["netG"] == "local"
    assert flags["no_flip"] is False
    assert flags["lr"] == pytest.approx(2e-4)
    cfg = from_reference_flags(flags)
    assert cfg.data.crop_size == 512 and cfg.model.net_g == "local"


def test_config_json_roundtrip(tmp_path):
    cfg = PRESETS["pix2pixhd_512"]
    path = str(tmp_path / "config.json")
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded == cfg


def test_reference_style_shim_translation():
    import sys
    sys.path.insert(0, "/root/repo")
    from train import _translate_reference_flags
    out = _translate_reference_flags(
        ["--dataroot", "/d", "--batchSize", "4", "--preset", "resnet9_256"])
    assert "--data.dataroot" in out and "--data.batch_size" in out
    assert "--preset" in out


def test_shim_handles_full_reference_launch_line():
    """A realistic reference launch line — store_true booleans, inverted
    flags, no-analog flags, label_nc 0 / no_instance — must translate
    without crashing parse_cli (round-3 fix: these previously fell
    through as unrecognized arguments)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from train import _translate_reference_flags
    from ir2rgb_tpu.config.config import parse_cli
    argv = ["--name", "exp1", "--dataroot", "/d", "--gpu_ids", "0,1",
            "--no_flip", "--no_lsgan", "--continue_train",
            "--label_nc", "0", "--no_instance", "--instance_feat",
            "--how_many", "inf", "--max_dataset_size=200",
            "--batchSize=8", "--tf_log", "--fp16", "--verbose"]
    out = _translate_reference_flags(argv)
    cfg = parse_cli(out)
    assert cfg.train.name == "exp1"
    assert cfg.data.dataroot == "/d"
    assert cfg.data.no_flip is True
    assert cfg.loss.gan_mode == "vanilla"          # --no_lsgan
    assert cfg.train.continue_train is True
    assert cfg.model.use_instance_feat is True
    assert cfg.infer.how_many is None              # inf -> unlimited
    assert cfg.data.max_dataset_size == 200        # --flag=value form
    assert cfg.data.batch_size == 8
    # one-hot label-map input is a real surface (model.label_nc), not a
    # dropped flag (round-3: the semantic-label path landed)
    cfg35 = parse_cli(_translate_reference_flags(["--label_nc", "35"]))
    assert cfg35.model.label_nc == 35


def test_shim_routes_which_epoch_to_both_sections():
    """--which_epoch appears in both the reference's train and test
    options; the shim must set train.which_epoch (resume) AND
    infer.which_epoch (restore for test.py) from the one flag. Also:
    --load_pretrain is a real warm-start path, not an ignored flag."""
    import sys
    sys.path.insert(0, "/root/repo")
    from train import _translate_reference_flags
    from ir2rgb_tpu.config.config import parse_cli
    out = _translate_reference_flags(
        ["--which_epoch", "30", "--load_pretrain", "/runs/prev"])
    cfg = parse_cli(out)
    assert cfg.train.which_epoch == "30"
    assert cfg.infer.which_epoch == "30"
    assert cfg.train.load_pretrain == "/runs/prev"


def test_config_and_preset_together_rejected(tmp_path):
    """--config then --preset used to silently replace the whole file
    config with the preset (wrong dataroot/run_dir); now it's an error."""
    import pytest

    from ir2rgb_tpu.config import Config, save_config

    path = str(tmp_path / "run.json")
    save_config(Config(), path)
    with pytest.raises(SystemExit):
        parse_cli(["--config", path, "--preset", "pix2pix_unet256"])


def test_shim_translates_init_type_lr_policy_netd_pixel():
    import sys
    sys.path.insert(0, "/root/repo")
    from train import _translate_reference_flags
    from ir2rgb_tpu.config.config import parse_cli
    out = _translate_reference_flags(
        ["--init_type", "xavier", "--lr_policy", "cosine",
         "--lr_decay_iters", "25", "--netD", "pixel"])
    cfg = parse_cli(out)
    assert cfg.model.init_type == "xavier"
    assert cfg.train.lr_policy == "cosine"
    assert cfg.train.lr_decay_iters == 25
    assert cfg.model.net_d == "pixel"
