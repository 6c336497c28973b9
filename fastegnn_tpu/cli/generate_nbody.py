"""N-body dataset generation CLI (reference ``datagen/generate_dataset.py``).

Usage:
    python -m fastegnn_tpu.cli.generate_nbody --path data --n_isolated 5 \
        [--n_stick 0] [--n_hinge 0] [--num-train 10000] ...

Defaults mirror the reference argparse block
(``datasets/nbody/datagen/generate_dataset.py:10-41``).
"""

from __future__ import annotations

import argparse

from fastegnn_tpu.data.nbody_sim import generate_dataset


def main(argv=None):
    p = argparse.ArgumentParser(description="Charged N-body data generation")
    p.add_argument("--path", type=str, default="data")
    p.add_argument("--num-train", type=int, default=10000)
    p.add_argument("--num-valid", type=int, default=2000)
    p.add_argument("--num-test", type=int, default=2000)
    p.add_argument("--length", type=int, default=5000)
    p.add_argument("--sample-freq", type=int, default=100)
    p.add_argument("--n_isolated", type=int, default=5)
    p.add_argument("--n_stick", type=int, default=0)
    p.add_argument("--n_hinge", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_workers", type=int, default=1,
                   help="parallel trajectory workers (ref datagen "
                        "run.sh/generate_dataset.py:74 joblib n_jobs)")
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--box_size", type=float, default=None)
    p.add_argument(
        "--gaussians", type=int, default=0, choices=[0, 3, 10],
        help="Gaussian-mixture initial placement (clustered graphs); "
        "0 = single Gaussian (ref datasets/nbody/script/system.py:38-76)",
    )
    args = p.parse_args(argv)

    name = generate_dataset(
        args.path,
        args.n_isolated,
        n_stick=args.n_stick,
        n_hinge=args.n_hinge,
        num_train=args.num_train,
        num_valid=args.num_valid,
        num_test=args.num_test,
        length=args.length,
        sample_freq=args.sample_freq,
        seed=args.seed,
        n_workers=args.n_workers,
        suffix_extra=(f"_{args.gaussians}g" if args.gaussians else "")
        + args.suffix,
        box_size=args.box_size,
        gaussians=args.gaussians,
    )
    print(f"dataset '{name}' written to {args.path}")
    return name


if __name__ == "__main__":
    main()
