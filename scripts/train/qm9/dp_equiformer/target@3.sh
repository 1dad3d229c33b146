#!/bin/bash
# QM9 target 3, dot-product attention — analog of scripts/train/qm9/dp_equiformer/target@3.sh
python -m equiformer_tpu.cli.train_qm9 \
    --output-dir 'runs/qm9/dp_equiformer/target@3' \
    --model-name 'dot_product_attention_transformer_l2' \
    --input-irreps '5x0e' \
    --target 3 \
    --data-path 'datasets/qm9' \
    --feature-type 'one_hot' \
    --batch-size 128 \
    --radius 5.0 \
    --num-basis 128 \
    --drop-path 0.0 \
    --weight-decay 5e-3 \
    --lr 5e-4 \
    --min-lr 1e-6 \
    --no-model-ema "$@"
