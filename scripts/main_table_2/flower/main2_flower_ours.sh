#!/bin/bash
# Paper-table launcher (reference scripts/main_table_2). TPU trainer.

python -m scnerf_tpu.cli.train \
    --config configs/llff/flower_ours.txt \
    --expname "$(basename "${0%.*}")" \
    --multiplicative_noise True --grid_size 10 \
    --ray_dist_loss_weight 0.0001 --i_ray_dist_loss 10 \
    --ray_o_noise_scale 1e-3 --ray_d_noise_scale 1e-3 \
    --add_ie 200000 --add_od 400000 --add_prd 600000 \
    --N_iters 800001 --lrate_decay 400 \
    --ft_path "logs/main2_flower_nerf/ckpts" "$@"
