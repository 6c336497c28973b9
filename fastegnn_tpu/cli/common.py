"""Shared CLI plumbing for the three training entry points."""

from __future__ import annotations

import argparse
import json
import time


def add_common_args(p: argparse.ArgumentParser, *, sigma: float, weight: float,
                    batch_size: int, cutoff_rate: float) -> None:
    p.add_argument("--exp_name", type=str, default="simple-exp")
    p.add_argument("--model", type=str, default="FastEGNN")
    p.add_argument("--dim_hidden", type=int, default=64)
    p.add_argument("--num_layer", type=int, default=4)
    p.add_argument("--attention_required", action="store_true")
    p.add_argument("--direction_vector_normalize_required", action="store_true")
    p.add_argument("--tanh_required", action="store_true")
    p.add_argument("--sigma", type=float, default=sigma)
    p.add_argument("--weight", type=float, default=weight)
    p.add_argument("--max_train_samples", type=int, default=int(1e8))
    p.add_argument("--max_test_samples", type=int, default=int(1e8))
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--batch_size", type=int, default=batch_size)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-12)
    p.add_argument("--early_stop", type=int, default=100)
    p.add_argument("--sample", type=int, default=3)
    p.add_argument("--max_epochs", type=int, default=1_000_000)
    p.add_argument("--ckpt_directory", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--test_interval", type=int, default=5)
    p.add_argument("--cutoff_rate", type=float, default=cutoff_rate)
    p.add_argument("--virtual_channel", type=int, required=True)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--profile_trace", type=str, default=None,
                   help="write a jax.profiler trace of one training epoch "
                        "(the second, post-compilation) to this directory")


def run_training(args, dataset_train, dataset_valid, dataset_test,
                 per_graph_sampling: bool, gravity=None):
    import jax

    from fastegnn_tpu.models import MMD_MODELS, get_model
    from fastegnn_tpu.train import TrainState, torch_adam, train

    print(
        f"train/valid/test sizes: {len(dataset_train)}/"
        f"{len(dataset_valid)}/{len(dataset_test)}"
    )
    model = get_model(
        args.model,
        hidden=args.dim_hidden,
        virtual_channels=args.virtual_channel,
        n_layers=args.num_layer,
        attention=args.attention_required,
        normalize=args.direction_vector_normalize_required,
        tanh=args.tanh_required,
        gravity=gravity,
        compute_dtype=args.compute_dtype,
    )
    example = dataset_train.collate(
        list(range(min(args.batch_size, len(dataset_train))))
    )
    apply_fn = None
    init_args = (example,)
    if args.model == "EGHN":
        # EGHN consumes the bond graph as pooling edges (reference
        # utils/train.py:69-79); prediction = x_out; the auxiliary cut_loss
        # is computed but, like the reference, not added to the training
        # loss (basic.py:672 stores it unused).
        if example.local_dst is None:
            raise ValueError(
                "EGHN needs local bond edges: construct the dataset with "
                "with_local_edges=True"
            )

        def apply_fn(params, batch):
            g = batch[0] if isinstance(batch, tuple) else batch
            x_out, _h, _cut = model.apply(
                {"params": params}, g, g.local_dst, g.local_src,
                g.local_edge_attr, g.local_edge_mask,
            )
            return x_out

        init_args = (example, example.local_dst, example.local_src,
                     example.local_edge_attr, example.local_edge_mask)
    # jitted init: eager init pays a device round-trip per op (slow on
    # tunneled TPU backends)
    params = jax.jit(model.init)(jax.random.key(args.seed), *init_args)["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Number of parameters: {n_params}")

    tx = torch_adam(args.learning_rate, args.weight_decay)
    state = TrainState.create(params, tx)
    log_name = f"{args.exp_name}_loss_{time.strftime('%Y-%m-%d_%H-%M-%S')}.json"
    best, log, state = train(
        model, state, tx, dataset_train, dataset_valid, dataset_test,
        batch_size=args.batch_size, sigma=args.sigma, weight=args.weight,
        sample=args.sample, per_graph_sampling=per_graph_sampling,
        use_mmd=args.model in MMD_MODELS, test_interval=args.test_interval,
        early_stop=args.early_stop, max_epochs=args.max_epochs,
        seed=args.seed, log_directory=args.log_directory, log_name=log_name,
        ckpt_directory=args.ckpt_directory,
        resume_from=args.resume,
        apply_fn=apply_fn,
        profile_trace_dir=getattr(args, "profile_trace", None),
    )
    print(json.dumps(best, indent=2))
    return best
