"""N-body training CLI (reference ``main_nbody.py`` equivalent).

Usage:
    python -m fastegnn_tpu.cli.nbody --data_directory DATA --dataset_name 5_0_0 \
        --virtual_channel 3 [--model FastEGNN] [--mesh data=2,graph=4] ...

Defaults mirror the reference argparse block (``main_nbody.py:22-68``):
sigma 1.5, weight 0.01, batch 100, lr 5e-4, wd 1e-12, H=64, L=4, seed 43,
early_stop 100, test_interval 5, sample 3, cutoff_rate 0.25.  ``--mesh``
adds distributed training over a data x graph device mesh (new capability;
the reference is single-device, SURVEY.md §2c).
"""

from __future__ import annotations

import argparse

import jax

from fastegnn_tpu.cli.common import add_common_args, run_training


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FastEGNN-TPU N-body training")
    add_common_args(p, sigma=1.5, weight=0.01, batch_size=100,
                    cutoff_rate=0.25)
    p.add_argument("--data_directory", type=str, required=True)
    p.add_argument("--dataset_name", type=str, required=True)
    p.add_argument("--log_directory", type=str, default="./logs/nbody")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    from fastegnn_tpu.data.nbody import NBodyDataset

    ds = lambda part, mx: NBodyDataset(
        args.data_directory,
        args.dataset_name,
        partition=part,
        virtual_channels=args.virtual_channel,
        cutoff_rate=args.cutoff_rate,
        max_samples=mx,
        rotation_seed=args.seed,
    )
    dataset_train = ds("train", args.max_train_samples)
    dataset_valid = ds("valid", args.max_test_samples)
    dataset_test = ds("test", args.max_test_samples)
    return run_training(
        args, dataset_train, dataset_valid, dataset_test,
        per_graph_sampling=False,
    )


if __name__ == "__main__":
    main()
