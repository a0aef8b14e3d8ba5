#!/bin/bash
# Canonical full run (reference demo.sh): camera model + PRD + custom optim.
python -m scnerf_tpu.cli.train --config configs/llff/fern_ours.txt "$@"
