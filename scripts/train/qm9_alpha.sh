#!/bin/bash
# QM9 alpha (target 1) — analog of scripts/train/qm9/equiformer/target@1.sh
python -m equiformer_tpu.cli.train_qm9 \
  --model-name graph_attention_transformer_nonlinear_l2 \
  --target 1 --data-path datasets/qm9 \
  --epochs 300 --batch-size 128 --lr 5e-4 --min-lr 1e-6 \
  --weight-decay 5e-3 --warmup-epochs 10 \
  --output-dir runs/qm9_alpha "$@"
