#!/bin/bash
# Paper-table launcher (reference scripts/main_table_3). TPU trainer.

python -m scnerf_tpu.cli.train --config configs/tanks_and_temples/tat_intermediate_M60_ours.txt "$@"
