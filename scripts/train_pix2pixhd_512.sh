#!/bin/bash
# pix2pixHD config (BASELINE.json:9): global+local G, multiscale D, FM+VGG @512
python -m ir2rgb_tpu.cli.train --preset pix2pixhd_512 \
    --data.dataroot "${DATAROOT:?set DATAROOT}" \
    --train.name pix2pixhd_512 "$@"
