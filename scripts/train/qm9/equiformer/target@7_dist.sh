#!/bin/bash
# QM9 target 7 — analog of reference scripts/train/qm9/equiformer/target@7_dist.sh
python -m equiformer_tpu.cli.train_qm9 \
    --output-dir 'runs/qm9/equiformer/target@7' \
    --model-name 'graph_attention_transformer_nonlinear_bessel_l2_drop00' \
    --input-irreps '5x0e' \
    --target 7 \
    --data-path 'datasets/qm9' \
    --feature-type 'one_hot' \
    --batch-size 32 \
    --radius 5.0 \
    --num-basis 8 \
    --drop-path 0.0 \
    --weight-decay 0.0 \
    --lr 1.5e-4 \
    --epochs 600 \
    --min-lr 1e-6 \
    --no-model-ema \
    --no-standardize \
    --dp 2 "$@"
