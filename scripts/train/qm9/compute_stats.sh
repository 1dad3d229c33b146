#!/bin/bash
# QM9 dataset statistics — analog of scripts/train/qm9/compute_stats.sh
python -m equiformer_tpu.cli.compute_stats \
    --dataset qm9 --data-path 'datasets/qm9' --radius 5.0 "$@"
