#!/bin/bash
# QM9 alpha, data-parallel over 8 chips (analog of target@7_dist.sh / torch.distributed.launch)
python -m equiformer_tpu.cli.train_qm9 \
  --model-name graph_attention_transformer_nonlinear_l2 \
  --target 1 --data-path datasets/qm9 \
  --epochs 300 --batch-size 128 --dp 8 \
  --output-dir runs/qm9_alpha_dp8 "$@"
