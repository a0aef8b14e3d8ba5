#!/bin/bash
# Paper-table launcher (reference scripts/main_table_4). TPU trainer.

python -m scnerf_tpu.cli.train --config configs/fisheyenerf/globe_ours.txt "$@"
