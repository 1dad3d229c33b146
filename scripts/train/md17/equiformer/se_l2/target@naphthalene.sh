#!/bin/bash
# MD17 naphthalene (se_l2) — analog of scripts/train/md17/equiformer/se_l2/target@naphthalene.sh
python -m equiformer_tpu.cli.train_md17 \
    --output-dir 'runs/md17/equiformer/se_l2/target@naphthalene' \
    --model-name 'graph_attention_transformer_nonlinear_exp_l2_md17' \
    --input-irreps '64x0e' \
    --molecule 'naphthalene' \
    --data-path 'datasets/md17' \
    --epochs 1500 \
    --lr 5e-4 \
    --batch-size 8 \
    --eval-batch-size 24 \
    --weight-decay 1e-6 \
    --num-basis 32 \
    --energy-weight 1 \
    --force-weight 80 "$@"
