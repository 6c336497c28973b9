#!/usr/bin/env bash
# Canonical protein recipe (reference run_protein.sh:1-10): FastEGNN on the
# AdK equilibrium MD dataset. Run with --preprocess first on a host with
# MDAnalysis to produce the .npz (see fastegnn_tpu/data/protein.py).
set -euo pipefail

data_directory=${DATA_DIRECTORY:-data/protein}
virtual_channel=3
cutoff_rate=0.5
model=${MODEL:-FastEGNN}

python -m fastegnn_tpu.cli.protein --model "$model" \
    --data_directory "$data_directory" --dataset_name 'adk' \
    --seed 43 --early_stop 100 \
    --virtual_channel $virtual_channel --cutoff_rate $cutoff_rate "$@"
