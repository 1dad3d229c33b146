#!/bin/bash
# MD17 aspirin + DeNS (se_l3) — analog of scripts/train/md17/equiformer_dens/se_l3/target@aspirin.sh
python -m equiformer_tpu.cli.train_md17 \
    --use-dens \
    --output-dir 'runs/md17/equiformer_dens/se_l3/target@aspirin' \
    --config-yml 'configs/md17_dens/equiformer_dens_l3.yml' \
    --molecule 'aspirin' \
    --data-path 'datasets/md17' \
    --epochs 2000 \
    --lr 2e-4 \
    --batch-size 5 \
    --eval-batch-size 5 \
    --weight-decay 1e-6 \
    --energy-weight 1 \
    --force-weight 80 \
    --denoising-pos-prob 0.25 \
    --denoising-pos-weight 5.0 \
    --denoising-pos-std 0.05 \
    --denoising-corrupt-ratio 0.25 \
    --use-denoising-pos-weight-linear-decay "$@"
