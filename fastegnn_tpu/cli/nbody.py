"""N-body training CLI (reference ``main_nbody.py`` equivalent).

Usage:
    python -m fastegnn_tpu.cli.nbody --data_directory DATA --dataset_name 5_0_0 \
        --virtual_channel 3 [--model FastEGNN] ...

Defaults mirror the reference argparse block (``main_nbody.py:22-68``):
sigma 1.5, weight 0.01, batch 100, lr 5e-4, wd 1e-12, H=64, L=4, seed 43,
early_stop 100, test_interval 5, sample 3, cutoff_rate 0.25.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FastEGNN-TPU N-body training")
    p.add_argument("--exp_name", type=str, default="simple-exp")
    p.add_argument("--model", type=str, default="FastEGNN")
    p.add_argument("--dim_hidden", type=int, default=64)
    p.add_argument("--num_layer", type=int, default=4)
    p.add_argument("--attention_required", action="store_true")
    p.add_argument("--direction_vector_normalize_required", action="store_true")
    p.add_argument("--tanh_required", action="store_true")
    p.add_argument("--sigma", type=float, default=1.5)
    p.add_argument("--weight", type=float, default=0.01)
    p.add_argument("--data_directory", type=str, required=True)
    p.add_argument("--dataset_name", type=str, required=True)
    p.add_argument("--max_train_samples", type=int, default=int(1e8))
    p.add_argument("--max_test_samples", type=int, default=int(1e8))
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-12)
    p.add_argument("--early_stop", type=int, default=100)
    p.add_argument("--sample", type=int, default=3)
    p.add_argument("--max_epochs", type=int, default=1_000_000)
    p.add_argument("--log_directory", type=str, default="./logs/nbody")
    p.add_argument("--ckpt_directory", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--test_interval", type=int, default=5)
    p.add_argument("--cutoff_rate", type=float, default=0.25)
    p.add_argument("--virtual_channel", type=int, required=True)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu'); default = ambient")
    p.add_argument("--profile_trace", type=str, default=None,
                   help="write a jax.profiler trace of one training epoch "
                        "(the second, post-compilation) to this directory")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    from fastegnn_tpu.data.nbody import NBodyDataset
    from fastegnn_tpu.models import MMD_MODELS, get_model
    from fastegnn_tpu.train import TrainState, torch_adam, train

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
    print(f"train/valid/test sizes: {len(dataset_train)}/{len(dataset_valid)}/{len(dataset_test)}")

    model = get_model(
        args.model,
        hidden=args.dim_hidden,
        virtual_channels=args.virtual_channel,
        n_layers=args.num_layer,
        num_blocks=args.num_layer,     # DimeNet family (main_nbody.py:124)
        attention=args.attention_required,
        normalize=args.direction_vector_normalize_required,
        tanh=args.tanh_required,
    )
    apply_fn = None
    if args.model in ("DimeNet", "DimeNet++"):
        # triplet tables ride along with each batch (ref dispatch
        # utils/train.py:97-98; triplets from torch_sparse, here host-built)
        from fastegnn_tpu.models import TripletDataset

        dataset_train = TripletDataset(dataset_train)
        dataset_valid = TripletDataset(dataset_valid)
        dataset_test = TripletDataset(dataset_test)
        apply_fn = lambda params, batch: model.apply(
            {"params": params}, batch[0], batch[1]
        )
    example = dataset_train.collate(list(range(min(args.batch_size, len(dataset_train)))))
    # jitted init: eager init pays a device round-trip per op (slow on
    # tunneled TPU backends)
    init_args = example if isinstance(example, tuple) else (example,)
    params = jax.jit(model.init)(jax.random.key(args.seed), *init_args)["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Number of parameters: {n_params}")

    tx = torch_adam(args.learning_rate, args.weight_decay)
    state = TrainState.create(params, tx)

    log_name = f"{args.exp_name}_loss_{time.strftime('%Y-%m-%d_%H-%M-%S')}.json"
    best, log, state = train(
        model,
        state,
        tx,
        dataset_train,
        dataset_valid,
        dataset_test,
        batch_size=args.batch_size,
        sigma=args.sigma,
        weight=args.weight,
        sample=args.sample,
        use_mmd=args.model in MMD_MODELS,
        test_interval=args.test_interval,
        early_stop=args.early_stop,
        max_epochs=args.max_epochs,
        seed=args.seed,
        log_directory=args.log_directory,
        log_name=log_name,
        ckpt_directory=args.ckpt_directory,
        resume_from=args.resume,
        profile_trace_dir=args.profile_trace,
        apply_fn=apply_fn,
    )
    print(json.dumps(best, indent=2))
    return best


if __name__ == "__main__":
    main()
