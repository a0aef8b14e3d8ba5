#!/bin/bash
python -m scnerf_tpu.cli.render --config configs/llff/fern_ours.txt --split test "$@"
