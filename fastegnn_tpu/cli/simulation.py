"""Water-3D training CLI (reference ``main_simulation.py`` equivalent).

Usage:
    python -m fastegnn_tpu.cli.simulation --data_directory DATA \
        --dataset_name Water-3D --virtual_channel 3 ...

Defaults mirror ``main_simulation.py:22-56``: sigma 1.0, weight 0.01,
batch 20, delta_t via dataset (15; CLI used 20 in the reference run script),
FastEGNN built with gravity [0, -1, 0] (``main_simulation.py:105``).
"""

from __future__ import annotations

import argparse

import jax

from fastegnn_tpu.cli.common import add_common_args, run_training


def build_parser():
    p = argparse.ArgumentParser(description="FastEGNN-TPU Water-3D training")
    add_common_args(p, sigma=1.0, weight=0.01, batch_size=20, cutoff_rate=0.25)
    p.add_argument("--data_directory", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="Water-3D")
    p.add_argument("--delta_t", type=int, default=15)
    p.add_argument("--radius", type=float, default=0.035)
    p.add_argument("--log_directory", type=str, default="./logs/simulation")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    from fastegnn_tpu.data.simulation import SimulationDataset

    mk = lambda part, mx: SimulationDataset(
        args.data_directory, args.dataset_name, partition=part,
        virtual_channels=args.virtual_channel, cutoff_rate=args.cutoff_rate,
        max_samples=mx, delta_t=args.delta_t, radius=args.radius,
        seed=args.seed,
    )
    dtr = mk("train", args.max_train_samples)
    # shared capacity across splits so eval batches reuse the compiled step
    dva = mk("valid", args.max_test_samples)
    dte = mk("test", args.max_test_samples)
    return run_training(
        args, dtr, dva, dte, per_graph_sampling=True, gravity=(0.0, -1.0, 0.0)
    )


if __name__ == "__main__":
    main()
