#!/usr/bin/env bash
# Canonical protein recipe (reference run_protein.sh:1-10): FastEGNN on the
# AdK equilibrium MD dataset.  The MDAnalysis download/parse runs once as a
# host-side preprocessing stage that writes an .npz of arrays; training
# consumes only the .npz (TPU hosts never import MDAnalysis).
set -euo pipefail

data_directory=${DATA_DIRECTORY:-data/protein}
npz=${NPZ:-"$data_directory/adk.npz"}
virtual_channel=3
cutoff_rate=0.5
model=${MODEL:-FastEGNN}

if [ ! -f "$npz" ]; then
    python -m fastegnn_tpu.cli.protein --preprocess \
        --data_directory "$data_directory" --npz "$npz"
fi

python -m fastegnn_tpu.cli.protein --model "$model" --npz "$npz" \
    --seed 43 --early_stop 100 \
    --virtual_channel $virtual_channel --cutoff_rate $cutoff_rate "$@"
