#!/bin/bash
# Paper-table launcher (reference scripts/main_table_1). TPU trainer.

python -m scnerf_tpu.cli.train \
    --config configs/llff/leaves_ours.txt \
    --expname "$(basename "${0%.*}")" \
    --camera_model none --ray_loss_type none \
    --run_without_colmap both \
    --N_iters 800001 --lrate_decay 400 "$@"
