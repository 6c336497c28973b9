#!/usr/bin/env bash
# Canonical Water-3D recipe (reference run_simulation.sh:1-10): FastEGNN with
# gravity [0,-1,0] on the Water-3D particle trajectories.
set -euo pipefail

data_directory=${DATA_DIRECTORY:-data/simulation}
virtual_channel=3
cutoff_rate=0.5
model=${MODEL:-FastEGNN}

python -m fastegnn_tpu.cli.simulation --model "$model" \
    --data_directory "$data_directory" --dataset_name 'Water-3D' \
    --seed 43 --early_stop 100 \
    --virtual_channel $virtual_channel --cutoff_rate $cutoff_rate "$@"
