#!/bin/bash
# OC20 IS2RE 18 blocks + IS2RS aux + Noisy Nodes (reference headline ~0.4156 eV config)
python -m equiformer_tpu.cli.train_oc20 \
  --config-yml configs/oc20/l1_256_blocks18_nonlinear_aux.yml \
  --output-dir runs/oc20_l1_18b_aux "$@"
