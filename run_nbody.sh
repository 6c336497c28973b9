#!/usr/bin/env bash
# Canonical N-body recipe (reference run_nbody.sh:1-10): FastEGNN on the
# 100-particle charged dataset, virtual_channel=3, cutoff_rate=0.5, seed 43.
set -euo pipefail

data_directory=${DATA_DIRECTORY:-data/nbody}
virtual_channel=3
cutoff_rate=0.5
model=${MODEL:-FastEGNN}

python -m fastegnn_tpu.cli.nbody --model "$model" \
    --data_directory "$data_directory" --dataset_name '100_0_0' \
    --seed 43 --early_stop 100 \
    --virtual_channel $virtual_channel --cutoff_rate $cutoff_rate "$@"
