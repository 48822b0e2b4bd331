#!/bin/bash
# pix2pix config (BASELINE.json:8): U-Net-256 + 70x70 PatchGAN, GAN+L1
python -m ir2rgb_tpu.cli.train --preset pix2pix_unet256 \
    --data.dataroot "${DATAROOT:?set DATAROOT}" \
    --train.name pix2pix_unet256 "$@"
