#!/bin/bash
# OC20 IS2RE l1_256_e3_nonlinear_split@all_g@2 — analog of scripts/train/oc20/is2re/graph_attention_transformer/l1_256_e3_nonlinear_split@all_g@2.sh
python -m equiformer_tpu.cli.train_oc20 \
    --config-yml 'configs/oc20/is2re/l1_256_e3_nonlinear.yml' \
    --output-dir 'runs/oc20/is2re/graph_attention_transformer/l1_256_e3_nonlinear_split@all_g@2' \
    --override dataset.train_src=datasets/oc20/is2re/all/train/data.lmdb dataset.val_src=datasets/oc20/is2re/all/val_id/data.lmdb \
    --dp 2 "$@"
