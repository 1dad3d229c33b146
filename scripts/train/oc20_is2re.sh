#!/bin/bash
# OC20 IS2RE — analog of scripts/train/oc20 launch scripts
python -m equiformer_tpu.cli.train_oc20 \
  --config-yml configs/oc20/l1_256_nonlinear.yml \
  --output-dir runs/oc20_l1 "$@"
