"""Protein MD training CLI (reference ``main_protein.py`` equivalent).

Two-step flow:
    # once, on a host with MDAnalysis(+Data):
    python -m fastegnn_tpu.cli.protein --preprocess --data_directory D --npz adk.npz
    # training (consumes the npz only):
    python -m fastegnn_tpu.cli.protein --npz adk.npz --virtual_channel 3 ...

Defaults mirror ``main_protein.py:26-72``: sigma 1.0, weight 0.5, batch 50,
delta_frame 15, backbone selection, test-split random rotation+translation.
"""

from __future__ import annotations

import argparse

import jax

from fastegnn_tpu.cli.common import add_common_args, run_training


def build_parser():
    p = argparse.ArgumentParser(description="FastEGNN-TPU protein MD training")
    add_common_args(p, sigma=1.0, weight=0.5, batch_size=50, cutoff_rate=0.25)
    p.add_argument("--npz", type=str, required=True,
                   help="preprocessed trajectory arrays (see --preprocess)")
    p.add_argument("--preprocess", action="store_true",
                   help="fetch AdK via MDAnalysisData and write --npz")
    p.add_argument("--data_directory", type=str, default="./data")
    p.add_argument("--backbone", action="store_true", default=True)
    p.add_argument("--delta_frame", type=int, default=15)
    p.add_argument("--log_directory", type=str, default="./logs/protein")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.preprocess:
        from fastegnn_tpu.data.protein import preprocess_adk

        preprocess_adk(args.data_directory, args.npz, backbone=args.backbone)
        print(f"wrote {args.npz}")
        return None
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    from fastegnn_tpu.data.protein import ProteinDataset

    mk = lambda part, mx: ProteinDataset(
        args.npz, partition=part, virtual_channels=args.virtual_channel,
        cutoff_rate=args.cutoff_rate, max_samples=mx,
        delta_frame=args.delta_frame, seed=args.seed,
        with_local_edges=args.model == "EGHN",
    )
    dtr = mk("train", args.max_train_samples)
    dva = mk("valid", args.max_test_samples)
    dte = mk("test", args.max_test_samples)
    return run_training(args, dtr, dva, dte, per_graph_sampling=False)


if __name__ == "__main__":
    main()
