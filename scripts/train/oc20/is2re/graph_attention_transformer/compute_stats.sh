#!/bin/bash
# OC20 IS2RE statistics — analog of scripts/train/oc20/is2re/graph_attention_transformer/compute_stats.sh
python -m equiformer_tpu.cli.compute_stats \
    --dataset oc20 --data-path 'datasets/oc20/is2re' --radius 5.0 "$@"
