#!/bin/bash
# MD17 aspirin (se_l3) — analog of scripts/train/md17/equiformer/se_l3/target@aspirin.sh
python -m equiformer_tpu.cli.train_md17 \
    --output-dir 'runs/md17/equiformer/se_l3/target@aspirin' \
    --model-name 'graph_attention_transformer_nonlinear_exp_l3_md17' \
    --input-irreps '64x0e' \
    --molecule 'aspirin' \
    --data-path 'datasets/md17' \
    --epochs 2000 \
    --lr 2e-4 \
    --batch-size 5 \
    --eval-batch-size 16 \
    --weight-decay 1e-6 \
    --num-basis 32 \
    --energy-weight 1 \
    --force-weight 100 "$@"
