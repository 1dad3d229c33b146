#!/bin/bash
# MD17 aspirin with DeNS — analog of scripts/train/md17_dens aspirin script
python -m equiformer_tpu.cli.train_md17 \
  --use-dens --molecule aspirin --data-path datasets/md17 \
  --epochs 1500 --batch-size 8 --lr 5e-4 \
  --energy-weight 1 --force-weight 80 \
  --denoising-pos-weight 1.0 --denoising-pos-prob 0.5 --denoising-pos-std 0.05 \
  --output-dir runs/md17_aspirin_dens "$@"
