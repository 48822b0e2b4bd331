#!/bin/bash
# inference gallery (reference test.py analog)
python -m ir2rgb_tpu.cli.infer --preset resnet9_256 \
    --data.dataroot "${DATAROOT:?set DATAROOT}" \
    --train.name "${NAME:-experiment}" "$@"
