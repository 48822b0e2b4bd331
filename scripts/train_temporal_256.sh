#!/bin/bash
# temporal video config (BASELINE.json:10): previous-frame conditioning
python -m ir2rgb_tpu.cli.train --preset temporal_256 \
    --data.dataroot "${DATAROOT:?set DATAROOT}" \
    --train.name temporal_256 "$@"
