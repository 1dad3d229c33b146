#!/bin/bash
# Train all 8 MD17 molecules sequentially (analog of scripts/train/md17/* family)
for MOL in aspirin benzene ethanol malonaldehyde naphthalene salicylic toluene uracil; do
  python -m equiformer_tpu.cli.train_md17 \
    --molecule "$MOL" --data-path datasets/md17 \
    --model-name graph_attention_transformer_nonlinear_exp_l2_md17 \
    --energy-weight 1 --force-weight 80 \
    --output-dir "runs/md17_$MOL" "$@"
done
