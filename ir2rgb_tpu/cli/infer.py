"""Inference entry point — reference ``python test.py`` analog
(SURVEY.md §3.2): sequential batch-1 translation of a frame folder, PNG
outputs + HTML gallery + PSNR/SSIM against ground truth when present.

Loads the generator from an Orbax run checkpoint (``--infer.which_epoch``)
or directly from a torch ``.pth`` via ``--torch_g path`` (parity mode).
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    from ir2rgb_tpu.config import parse_cli
    from ir2rgb_tpu.data import DataLoader, preprocess_pair_batch
    from ir2rgb_tpu.infer import (
        StreamingGenerator,
        psnr,
        ssim,
        tensor2im,
    )
    from ir2rgb_tpu.obs import Visualizer
    from ir2rgb_tpu.obs.html import HTMLPage
    from ir2rgb_tpu.train import create_model

    from ir2rgb_tpu.cli.common import load_generator_params, pop_flag

    argv = list(sys.argv[1:] if argv is None else argv)
    torch_g = pop_flag(argv, "--torch_g")
    cfg = parse_cli(argv)
    import dataclasses
    # test-time invariants (reference TestOptions): sequential batch-1
    # frames, no augmentation. Temporal models stream frame-by-frame with
    # the on-device carry, so the dataset is read as an aligned sequence.
    # dataset_mode single (input-only folders, no ground truth) is
    # honored; temporal datasets stream frame-by-frame as aligned pairs
    single = cfg.data.dataset_mode == "single"
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, phase="test", serial_batches=True, no_flip=True,
        batch_size=1, dataset_mode="single" if single else "aligned"))
    if single and cfg.infer.use_encoded_image:
        raise SystemExit("--infer.use_encoded_image needs ground-truth "
                         "images; dataset_mode=single has none")

    loader = DataLoader(cfg, phase="test", shuffle=False)
    model = create_model(cfg, steps_per_epoch=max(len(loader), 1))

    g_params = load_generator_params(cfg, model, torch_g)

    # Crop only in crop-style preprocess modes (mirrors cli/train.py and
    # the reference test path): scale_width/none run the full decoded
    # frame through the generator at the loader's target geometry.
    if "crop" in cfg.data.preprocess:
        crop = cfg.data.crop_size
        th, tw = loader.target_hw
        if th < crop or tw < crop:
            raise ValueError(
                f"decoded frames are {th}x{tw}, smaller than "
                f"crop_size={crop}; lower --data.crop_size or use a "
                f"non-crop preprocess mode")
        size_hw = (crop, crop)
    else:
        crop = None
        size_hw = loader.target_hw
    # cfg.infer.quant rides the model instance (GanModel.generate traces
    # its serving forward under quant.using — nn/quant.py); no global
    stream = StreamingGenerator(model, g_params, size_hw)

    results_dir = os.path.join(cfg.infer.results_dir, cfg.train.name,
                               f"{cfg.data.phase}_{cfg.infer.which_epoch}")
    page = HTMLPage(results_dir, f"Results: {cfg.train.name}")
    vis = Visualizer(results_dir, cfg.train.name)

    # test-time conditioning setup — fail loudly on misapplied flags
    # (the reference would fail loading netE weights; silently ignoring
    # them would hand back zero-feat generations labeled as styled)
    if ((cfg.infer.use_encoded_image or cfg.infer.cluster_path)
            and model.enc_cfg is None):
        raise SystemExit(
            "--infer.use_encoded_image/--infer.cluster_path need a "
            "use_instance_feat model (this run has no netE)")
    if cfg.infer.use_encoded_image and cfg.infer.cluster_path:
        raise SystemExit(
            "--infer.use_encoded_image and --infer.cluster_path are "
            "mutually exclusive (encode the real image OR sample "
            "clustered styles)")
    cluster_centers = None
    sample_jit = encode_jit = edges_jit = None
    if cfg.infer.cluster_path:
        from ir2rgb_tpu.infer.features import load_clusters, \
            sample_feature_map
        cluster_centers = jnp.asarray(load_clusters(cfg.infer.cluster_path))
        sample_jit = jax.jit(functools.partial(
            sample_feature_map, num_instances=model.enc_cfg.num_instances))
    if cfg.infer.use_encoded_image:
        encode_jit = jax.jit(
            lambda p, b, i: model.encode_features(p, b, i))
    if cfg.model.use_instance_edges:
        from ir2rgb_tpu.nn.encoders import instance_edges
        edges_jit = jax.jit(instance_edges)

    # cycle_gan galleries mirror the reference test driver's
    # real/fake/rec columns: the B->A generator reconstructs the input
    # from the translation (needs G_B in the checkpoint — the --torch_g
    # single-net import serves fake-only galleries)
    rec_jit = None
    if (cfg.model.model == "cycle_gan" and isinstance(g_params, dict)
            and "G_B" in g_params):
        rec_jit = jax.jit(
            lambda p, x: model.generate(p, x, direction="BtoA"))

    # --infer.video: assemble generated frames into MJPEG/AVI file(s),
    # one per source sequence (multi-video dataroots get one file each,
    # suffixed by the sequence directory name)
    video_writer = None
    video_paths = []

    def _open_video(video_dir: str):
        from ir2rgb_tpu.obs.video import MJPEGAviWriter
        base = cfg.infer.video
        if video_paths:  # 2nd+ sequence: suffix with the sequence name
            # (directory basename for frame folders; for AVI sources the
            # sequence key is the container file — strip its extension
            # so clip2.avi yields out_clip2.avi, not out_clip2.avi.avi)
            seq = os.path.basename(video_dir)
            if seq.lower().endswith(".avi"):
                seq = os.path.splitext(seq)[0]
            root, ext = os.path.splitext(base)
            base = f"{root}_{seq}{ext or '.avi'}"
        w = MJPEGAviWriter(base, fps=cfg.infer.video_fps,
                           quality=cfg.infer.video_quality)
        video_paths.append(base)
        return w

    psnrs, ssims = [], []
    how_many = cfg.infer.how_many or float("inf")
    count = 0
    prev_video = None
    for host_batch in loader.epoch():
        if count >= how_many:
            break
        # Temporal models carry generated frames across push() calls;
        # a multi-video dataroot (A/vid000, A/vid001, ...) must restart
        # the carry at each video boundary or vid001's first frames are
        # conditioned on vid000's last outputs (reference test.py
        # processes sequences independently).
        # sequence identity: the container file for AVI virtual frames,
        # the directory for frame folders
        from ir2rgb_tpu.data.video import sequence_key
        video = sequence_key(host_batch["paths"][0][0])
        if prev_video is not None and video != prev_video:
            stream.reset()
            if video_writer is not None:
                video_writer.close()
                video_writer = _open_video(video)
        if cfg.infer.video and video_writer is None:
            video_writer = _open_video(video)
        prev_video = video
        batch = preprocess_pair_batch(
            jnp.asarray(host_batch["a"]), jnp.asarray(host_batch["b"]),
            jax.random.PRNGKey(0), crop_size=crop, train=False,
            inst=(jnp.asarray(host_batch["inst"])
                  if "inst" in host_batch else None),
            label_a=cfg.model.label_nc > 0)
        # pix2pixHD test-time feature control (use_instance_feat models):
        # --use_encoded_image encodes the REAL target's style through
        # netE; --cluster_path samples precomputed style centroids per
        # instance; default feeds zeros (train-time prior).
        feat = None
        edges = None
        if "inst" in batch:
            if encode_jit is not None:
                feat = encode_jit(g_params, batch["b"], batch["inst"])
            elif sample_jit is not None:
                feat = sample_jit(batch["inst"], cluster_centers,
                                  jax.random.PRNGKey(count))
            if edges_jit is not None:
                edges = edges_jit(batch["inst"])
        # push_device donates its input buffer — snapshot the input image
        # for the gallery before handing the array over (label maps get
        # the reference's Colorize palette, not [-1,1] quantization)
        if cfg.model.label_nc > 0:
            from ir2rgb_tpu.infer.stream import label2im
            input_img = label2im(batch["a"], cfg.model.label_nc)
        else:
            input_img = tensor2im(batch["a"])
        fake = stream.push_device(batch["a"], feat=feat, edges=edges)
        if not single:  # single mode: batch['b'] is the input, not truth
            psnrs.append(float(psnr(fake, batch["b"])))
            ssims.append(float(ssim(fake, batch["b"])))

        def _ar(img):
            # reference --aspect_ratio: stretch output width for display
            if cfg.infer.aspect_ratio == 1.0:
                return img
            from PIL import Image
            h, w = img.shape[:2]
            # PIL rejects (H, W, 1) — squeeze gray to (H, W) (the PNG
            # encoder accepts both layouts)
            if img.ndim == 3 and img.shape[2] == 1:
                img = img[..., 0]
            return np.asarray(Image.fromarray(img).resize(
                (int(w * cfg.infer.aspect_ratio), h), Image.BICUBIC))

        visuals = {"input": _ar(input_img),
                   "generated": _ar(tensor2im(fake))}
        if video_writer is not None:
            video_writer.add(visuals["generated"])
        if rec_jit is not None:
            visuals["reconstructed"] = _ar(
                tensor2im(rec_jit(g_params, fake)))
        if not single:
            visuals["target"] = _ar(tensor2im(batch["b"]))
        vis.save_images(page, visuals, host_batch["paths"][0][0])
        count += 1
    vis.flush()  # async gallery writes hit disk before the page references them
    page.save()
    if video_writer is not None:
        video_writer.close()
        print(f"video: {', '.join(video_paths)}", flush=True)
    if psnrs:
        print(f"frames: {count}  PSNR: {np.mean(psnrs):.2f} dB  "
              f"SSIM: {np.mean(ssims):.4f}", flush=True)
    elif single:
        print(f"frames: {count}  (single mode: no ground truth, "
              f"no PSNR/SSIM)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
