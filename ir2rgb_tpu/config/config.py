"""Typed configuration system.

Replaces the reference's three-tier argparse option stack
(``options/base_options.py`` + ``train_options.py`` + ``test_options.py``,
~60-70 flags threaded through every constructor as a flat ``opt``
namespace — SURVEY.md §2.4) with frozen dataclasses grouped by subsystem.
Frozen + hashable so configs can be closed over by ``jax.jit`` as static
structure without retracing hazards.

Like the reference's ``opt.txt`` dump, every run serializes its resolved
config as JSON into the run directory (``save_config``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture knobs (reference: --model/--netG/--ngf/... flags)."""

    # "pix2pix" (GAN+L1), "pix2pixhd" (multiscale D + FM + VGG),
    # "temporal" (previous-frame conditioning on top of either),
    # "cycle_gan" (UNPAIRED: two generators + two discriminators with
    # cycle-consistency — train IR<->RGB without aligned frame pairs;
    # pair with --data.dataset_mode unaligned).
    model: str = "pix2pix"
    # Generator: resnet_9blocks | resnet_6blocks | unet_256 | unet_128 |
    #            global | local  (pix2pixHD coarse / coarse-to-fine)
    net_g: str = "resnet_9blocks"
    # Discriminator: n_layers (PatchGAN) | multiscale
    net_d: str = "n_layers"
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    n_layers_d: int = 3
    num_d: int = 2  # number of pyramid scales for multiscale D
    norm: str = "instance"  # instance | batch | none
    # pix2pixHD generator shape knobs
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_blocks_local: int = 3
    n_local_enhancers: int = 1
    # upsampling op inside generators: deconv (ConvTranspose parity) |
    # resize_conv (nearest-resize + conv; TPU-friendlier, no checkerboard)
    upsample: str = "deconv"
    # D taps intermediate features (needed for feature-matching loss)
    get_interm_feat: bool = True
    # generator dropout (reference --no_dropout inverse; the classic
    # pix2pix U-Net trains with dropout 0.5 on the inner levels)
    use_dropout: bool = False
    # reference --init_type: normal (default) | xavier | kaiming |
    # orthogonal — applied as a post-init rewrite (ops.apply_init_type)
    init_type: str = "normal"
    # pix2pixHD feature-encoder "netE" (reference --instance_feat /
    # --feat_num / --nef / --n_downsample_E): instance-wise pooled style
    # features from the real image are appended to G's input. Off by
    # default — ir2rgb's real-valued IR input has no instance maps.
    use_instance_feat: bool = False
    feat_num: int = 3
    nef: int = 16
    n_downsample_e: int = 4
    # concatenate the instance boundary map to the G/D input — the
    # reference's default-on edge channel (off under --no_instance;
    # ir2rgb's real-IR launches pass --no_instance, so off by default
    # here; enable for datasets that carry instance maps)
    use_instance_edges: bool = False
    # pix2pixHD --label_nc: when > 0 the A side is an integer semantic
    # label map (one PNG of class ids per frame) that is one-hot encoded
    # on device into label_nc channels for both G and D (the reference's
    # encode_input scatter). 0 = ir2rgb's real-valued IR input path
    # (SURVEY.md §2.2 pix2pixHD encode_input row; the [C] assumption that
    # ir2rgb runs label_nc=0 stays the default — this surfaces the
    # inherited pix2pixHD semantic-label mode for datasets that use it).
    label_nc: int = 0
    # static segment-space size for the on-device instance-wise pooling
    # (raw ids are hashed into this many slots; distinct ids that collide
    # share a style vector — raise this for datasets with many instances
    # per frame; the train step reports `inst_collisions` per batch)
    num_instances: int = 1024
    # temporal mode: how many previous generated frames condition G
    n_frames_g: int = 2
    # dtype policy: params fp32; compute bf16 on TPU ("bf16") or fp32
    compute_dtype: str = "float32"
    # rematerialize residual blocks in backward (trade FLOPs for HBM;
    # enables bigger batches at 512px)
    remat: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline knobs (reference: --dataroot/--loadSize/... flags)."""

    dataroot: str = ""
    phase: str = "train"
    # resize_and_crop | crop | scale_width | scale_width_and_crop | none
    preprocess: str = "resize_and_crop"
    load_size: int = 286
    crop_size: int = 256
    batch_size: int = 1
    serial_batches: bool = False
    no_flip: bool = False
    max_dataset_size: Optional[int] = None
    num_workers: int = 2
    # temporal dataset: frames per training window
    n_frames_total: int = 4
    # reference --which_direction: "AtoB" trains A->B (ir2rgb: IR->RGB);
    # "BtoA" swaps the pair so the model learns the reverse mapping
    direction: str = "AtoB"
    # aligned | unaligned (unpaired trainA/trainB, cycle_gan) |
    # temporal | single (test-only)
    dataset_mode: str = "aligned"


@dataclass(frozen=True)
class LossConfig:
    """Loss weights and switches (reference train_options flags)."""

    gan_mode: str = "lsgan"  # lsgan | vanilla | hinge | wgangp
    lambda_gp: float = 10.0  # wgangp gradient-penalty weight
    lambda_l1: float = 100.0
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    no_gan_feat_loss: bool = False
    no_vgg_loss: bool = False
    # path to a pretrained-VGG19 .npz (from `ir2rgb-convert vgg19`); empty
    # string = He-random fallback (create_model warns loudly)
    vgg_weights: str = ""
    pool_size: int = 0  # pix2pixHD default 0; classic pix2pix used 50
    # cycle_gan weights (the family's --lambda_A/--lambda_B/
    # --lambda_identity): forward cycle ||G_B(G_A(a)) - a||_1 * lambda_a,
    # backward cycle * lambda_b, and the identity terms
    # ||G_A(b) - b||_1 * lambda_b * lambda_identity (ditto mirrored) that
    # anchor color mapping when both domains share a channel space
    lambda_a: float = 10.0
    lambda_b: float = 10.0
    lambda_identity: float = 0.5


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / checkpoint cadence."""

    name: str = "experiment"
    checkpoints_dir: str = "./checkpoints"
    niter: int = 100          # epochs at constant lr
    niter_decay: int = 100    # epochs of linear lr decay to 0
    lr: float = 2e-4
    # reference --lr_policy: linear (default) | step | cosine
    # (plateau is metric-driven/host-side — not offered; see schedule.py)
    lr_policy: str = "linear"
    lr_decay_iters: int = 50  # reference --lr_decay_iters (step policy)
    beta1: float = 0.5
    beta2: float = 0.999
    # coarse-to-fine: epochs during which only the local enhancer trains
    niter_fix_global: int = 0
    save_latest_freq: int = 1000   # steps
    save_epoch_freq: int = 10      # epochs
    print_freq: int = 100          # steps
    display_freq: int = 400        # steps
    continue_train: bool = False
    which_epoch: str = "latest"
    # warm-start G/D from another run's checkpoint dir (reference
    # --load_pretrain)
    load_pretrain: str = ""
    seed: int = 0
    # data-parallel device count; 0 = all visible devices
    num_devices: int = 0
    # multi-host: call jax.distributed.initialize() at startup (every
    # host runs the same program; meshes then span the whole slice and
    # each host feeds its local shard via parallel.multihost.global_batch)
    multihost: bool = False
    # spatial partitioning: shard image rows (H) over this many devices
    # per data-parallel replica (dp x sp mesh; XLA inserts the conv halo
    # exchanges). 1 = pure DP. H and batch must divide evenly.
    spatial_devices: int = 1
    donate: bool = True
    # gradient accumulation: split each batch into this many sequential
    # micro-batches inside the fused step (lax.scan), average the grads,
    # apply ONE optimizer update — the effective batch of batch_size at
    # the activation memory of batch_size/grad_accum (high-res tiers on
    # one chip). batch_size must divide evenly. Framework extension; the
    # reference (and its DataParallel) has no equivalent.
    grad_accum: int = 1
    # exponential moving average of the generator params, updated every
    # step as ema = d*ema + (1-d)*params when > 0 (standard GAN serving
    # practice; the reference has no equivalent). Serve the averaged
    # weights with --infer.use_ema. 0 = off (no extra state kept).
    ema_decay: float = 0.0
    # dtype of Adam's first-moment accumulator (optax mu_dtype): "f32"
    # (default, reference-faithful) or "bf16". The 512p trunk's Adam
    # update is HBM-bound (18x f32[3,3,1024,1024] states re-read and
    # re-written every step — docs/DESIGN.md train profile); bf16 mu
    # halves that tensor's traffic at the cost of coarser momentum
    # rounding. Opt-in, never changes defaults. nu stays f32 (optax
    # exposes no nu_dtype; the variance term needs the mantissa).
    adam_mu_dtype: str = "f32"


@dataclass(frozen=True)
class InferConfig:
    results_dir: str = "./results"
    which_epoch: str = "latest"
    how_many: Optional[int] = None
    aspect_ratio: float = 1.0
    # pix2pixHD test-time feature control (use_instance_feat models):
    # encode the REAL target image's style through netE at test time
    # (reference --use_encoded_image) ...
    use_encoded_image: bool = False
    # ... or sample precomputed style clusters per instance (reference
    # --cluster_path; produce the file with cli/precompute_feats.py)
    cluster_path: str = ""
    n_clusters: int = 10  # reference --n_clusters (precompute CLI)
    # serve the EMA-averaged generator weights (requires the run to have
    # trained with --train.ema_decay > 0)
    use_ema: bool = False
    # quantized serving (nn/quant.py; serving-only — training refuses
    # it). READ BEFORE USING — every mode is measured on the chip
    # (docs/DESIGN.md §6b):
    #   "int8_mixed"  — w8a8 on wide convs only (nn/quant.py width
    #       gate). The mode with real wins: +10.7% fps at 2048p (34.1
    #       vs 30.8), +9.0% at 1024p (86.4 vs 80.0), +11.7% at 512p
    #       batch-8 (462.7 vs 414), +11.6% at the 8-stream serving
    #       knee; neutral at 512p batch-1. Quality on a TRAINED
    #       checkpoint: 44 dB vs the fp output with identical
    #       ground-truth PSNR (round-5 soak eval, DESIGN §6b addendum);
    #       the older ~30 dB figure was He-random-weights pessimism.
    #   "int8"        — w8a8 everywhere: strictly worse than int8_mixed
    #       at every tier, LOSES to bf16 at 512p (kept as the ablation
    #       baseline).
    #   "int8_w"      — weight-only: no throughput win by construction
    #       (documented in nn/quant.py); its value is the half-size
    #       sealed artifact and top quality (54.7 dB vs fp trained).
    # Recommendation: default "none" (exact serving); switch to
    # "int8_mixed" at the HBM-bound tiers (1024p+, batched 512p, or
    # multi-stream serving) — ~+10% fps at 44 dB-vs-fp on trained
    # weights (verify on your own checkpoint with
    # scripts/quant_trained_eval.py).
    quant: str = "none"
    # write generated frames to an MJPEG/AVI video file (obs/video.py;
    # dependency-free container + native libjpeg frames). Empty = off.
    # Multi-video dataroots write one file per source sequence: the
    # first at this exact path, the rest suffixed with the sequence name
    # (its directory or .avi-file basename).
    video: str = ""
    video_fps: float = 30.0
    video_quality: int = 90
    # ir2rgb-serve network daemon (infer/server.py): TCP endpoint, slot
    # count for the batched MultiStreamServer step, reply encoding
    # (raw | jpeg) and the batching window in milliseconds. The default
    # 8 slots IS the measured per-chip throughput knee at 512p (429-479
    # aggregate fps; DESIGN §6); more slots are fine — the compiled
    # batch stays capped at 8 and extra streams round-robin — while
    # 1024p serving prefers 1 slot/chip unless aggregate fps outranks
    # latency. The window exits early once every connection contributed
    # (lone connections skip it entirely).
    serve_host: str = "127.0.0.1"
    serve_port: int = 7788
    serve_slots: int = 8
    serve_encode: str = "raw"
    serve_quality: int = 90
    serve_tick_ms: float = 5.0
    # max frames the daemon holds end-to-end per connection before TCP
    # backpressure throttles a pipelining client (no error, no drop)
    serve_max_pending: int = 32


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)

    def run_dir(self) -> str:
        return os.path.join(self.train.checkpoints_dir, self.train.name)


# Presets mirroring BASELINE.json's five configs.
PRESETS = {
    # BASELINE.json:7 — single-frame 256x256 ResNet-9 inference
    "resnet9_256": Config(
        model=ModelConfig(model="pix2pix", net_g="resnet_9blocks"),
        data=DataConfig(load_size=286, crop_size=256),
    ),
    # BASELINE.json:8 — pix2pix U-Net + 70x70 PatchGAN, GAN+L1
    "pix2pix_unet256": Config(
        model=ModelConfig(model="pix2pix", net_g="unet_256", net_d="n_layers",
                          get_interm_feat=False),
        loss=LossConfig(no_gan_feat_loss=True, no_vgg_loss=True),
    ),
    # BASELINE.json:9 — pix2pixHD global+local, multiscale D, FM+VGG @512.
    # ngf=32 follows the family's 512p convention for the local tier (the
    # global trunk then runs at ngf_global = 32 * 2^1 = 64).
    "pix2pixhd_512": Config(
        model=ModelConfig(model="pix2pixhd", net_g="local", net_d="multiscale",
                          num_d=2, ngf=32),
        data=DataConfig(load_size=572, crop_size=512),
        loss=LossConfig(lambda_l1=0.0),
        train=TrainConfig(niter_fix_global=10),
    ),
    # pix2pixHD global-only @512 (coarse stage)
    "pix2pixhd_global_512": Config(
        model=ModelConfig(model="pix2pixhd", net_g="global", net_d="multiscale",
                          num_d=2),
        data=DataConfig(load_size=572, crop_size=512),
        loss=LossConfig(lambda_l1=0.0),
    ),
    # the family's headline high-res tier: 1024p coarse-to-fine (local
    # enhancer ngf=32 around the ngf_global=64 trunk, 3-scale D — the
    # pix2pixHD 1024p training recipe)
    "pix2pixhd_1024": Config(
        model=ModelConfig(model="pix2pixhd", net_g="local", net_d="multiscale",
                          num_d=3, ngf=32),
        data=DataConfig(load_size=1124, crop_size=1024),
        loss=LossConfig(lambda_l1=0.0),
        train=TrainConfig(niter_fix_global=10),
    ),
    # 2048p tier: two local enhancers around the global trunk (the
    # pix2pixHD 2048-wide recipe — each enhancer doubles resolution, so
    # the trunk trains/runs at 512 while the full frame is 2048)
    "pix2pixhd_2048": Config(
        model=ModelConfig(model="pix2pixhd", net_g="local", net_d="multiscale",
                          num_d=3, ngf=16, n_local_enhancers=2),
        data=DataConfig(load_size=2248, crop_size=2048),
        loss=LossConfig(lambda_l1=0.0),
        train=TrainConfig(niter_fix_global=10),
    ),
    # temporal conditioning at the 1024p coarse-to-fine tier (high-res
    # streaming video: pix2pixhd_1024 + prev-frame carry)
    "temporal_1024": Config(
        model=ModelConfig(model="temporal", net_g="local", net_d="multiscale",
                          num_d=3, ngf=32, n_frames_g=2),
        data=DataConfig(dataset_mode="temporal", n_frames_total=4,
                        load_size=1124, crop_size=1024),
        loss=LossConfig(lambda_l1=0.0),
        train=TrainConfig(niter_fix_global=10),
    ),
    # UNPAIRED IR<->RGB (the family's CycleGAN recipe): two ResNet-9
    # generators + two 70x70 PatchGANs, LSGAN + cycle consistency +
    # identity, 50-image pools per domain, no paired data needed
    "cyclegan_256": Config(
        model=ModelConfig(model="cycle_gan", net_g="resnet_9blocks",
                          net_d="n_layers", get_interm_feat=False),
        data=DataConfig(dataset_mode="unaligned", load_size=286,
                        crop_size=256),
        loss=LossConfig(no_gan_feat_loss=True, no_vgg_loss=True,
                        lambda_l1=0.0, pool_size=50),
    ),
    # BASELINE.json:10 — temporal previous-frame conditioning
    "temporal_256": Config(
        model=ModelConfig(model="temporal", net_g="resnet_9blocks",
                          net_d="multiscale", num_d=2, n_frames_g=2),
        data=DataConfig(dataset_mode="temporal", n_frames_total=4),
    ),
    # temporal conditioning on the 512p coarse-to-fine generator (the
    # streaming-video serving config: pix2pixhd_512 + prev-frame carry)
    "temporal_512": Config(
        model=ModelConfig(model="temporal", net_g="local", net_d="multiscale",
                          num_d=2, ngf=32, n_frames_g=2),
        data=DataConfig(dataset_mode="temporal", n_frames_total=4,
                        load_size=572, crop_size=512),
        loss=LossConfig(lambda_l1=0.0),
        train=TrainConfig(niter_fix_global=10),
    ),
}


def _add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str) -> None:
    for f in fields(cls):
        name = f"--{prefix}{f.name}"
        if f.type in ("bool", bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=None)
        elif f.type in ("Optional[int]", Optional[int]):
            parser.add_argument(name, type=int, default=None)
        elif f.type in ("int", int):
            parser.add_argument(name, type=int, default=None)
        elif f.type in ("float", float):
            parser.add_argument(name, type=float, default=None)
        else:
            parser.add_argument(name, type=str, default=None)


_SECTIONS = {"model": ModelConfig, "data": DataConfig, "loss": LossConfig,
             "train": TrainConfig, "infer": InferConfig}


def parse_cli(argv=None, default: Optional[Config] = None) -> Config:
    """Parse ``--preset name --section.field value`` style CLI overrides."""
    parser = argparse.ArgumentParser("ir2rgb_tpu")
    parser.add_argument("--preset", type=str, default=None,
                        choices=sorted(PRESETS.keys()))
    parser.add_argument("--config", type=str, default=None,
                        help="path to a config JSON to start from")
    for section, cls in _SECTIONS.items():
        _add_dataclass_args(parser, cls, f"{section}.")
    args = parser.parse_args(argv)
    cfg = default or Config()
    if args.config and args.preset:
        # loading the file and then replacing the whole Config with the
        # preset would silently discard every file setting (dataroot,
        # name, checkpoints_dir, ...) — refuse the ambiguity instead
        parser.error("--config and --preset both set a complete base "
                     "config; pass one (then override fields with "
                     "--section.field flags)")
    if args.config:
        cfg = load_config(args.config)
    if args.preset:
        cfg = PRESETS[args.preset]
    return config_from_args(cfg, args)


def config_from_args(cfg: Config, args: argparse.Namespace) -> Config:
    updates = {}
    for section, cls in _SECTIONS.items():
        sec_updates = {}
        for f in fields(cls):
            v = getattr(args, f"{section}.{f.name}", None)
            if v is not None:
                sec_updates[f.name] = v
        if sec_updates:
            updates[section] = dataclasses.replace(getattr(cfg, section), **sec_updates)
    return cfg.replace(**updates) if updates else cfg


def save_config(cfg: Config, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh, indent=2, sort_keys=True)


def load_config(path: str) -> Config:
    with open(path) as fh:
        raw = json.load(fh)
    return Config(**{
        section: cls(**raw.get(section, {})) for section, cls in _SECTIONS.items()
    })
