#!/bin/bash
# MD17 uracil + DeNS (se_l2) — analog of scripts/train/md17/equiformer_dens/se_l2/target@uracil.sh
python -m equiformer_tpu.cli.train_md17 \
    --use-dens \
    --output-dir 'runs/md17/equiformer_dens/se_l2/target@uracil' \
    --config-yml 'configs/md17_dens/equiformer_dens_l2.yml' \
    --molecule 'uracil' \
    --data-path 'datasets/md17' \
    --epochs 1500 \
    --lr 5e-4 \
    --batch-size 8 \
    --eval-batch-size 8 \
    --weight-decay 1e-6 \
    --energy-weight 1 \
    --force-weight 80 \
    --denoising-pos-prob 0.25 \
    --denoising-pos-weight 5.0 \
    --denoising-pos-std 0.05 \
    --denoising-corrupt-ratio 0.25 \
    --use-denoising-pos-weight-linear-decay "$@"
