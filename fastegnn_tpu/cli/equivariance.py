"""Standalone SE(3)-equivariance check (reference ``equivariant_test.py``).

Builds the requested model (default FastEGNN H=64, C=3, L=4 — the reference
config, ``equivariant_test.py:12-20``), a random graph, and asserts
``f(xR + t) == f(x)R + t`` under a random integer-degree rotation and a
random translation at atol 1e-4 (``equivariant_test.py:38-62``).

Usage: python -m fastegnn_tpu.cli.equivariance [--model FastEGNN] [--nodes 10]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="SE(3) equivariance check")
    p.add_argument("--model", type=str, default="FastEGNN")
    p.add_argument("--nodes", type=int, default=10)
    p.add_argument("--dim_hidden", type=int, default=64)
    p.add_argument("--num_layer", type=int, default=4)
    p.add_argument("--virtual_channel", type=int, default=3)
    p.add_argument("--atol", type=float, default=1e-4)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from fastegnn_tpu.models import get_model
    from fastegnn_tpu.ops.neighbors import cutoff_edges_np
    from fastegnn_tpu.ops.rotation import random_rotation

    rng = np.random.default_rng(args.seed)
    n = args.nodes
    loc = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.choice([-1.0, 1.0], size=(n, 1)).astype(np.float32)
    dst, src = cutoff_edges_np(loc, 0.0)
    d0 = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True).astype(np.float32)
    spec = GraphSpec(max_nodes=n, max_edges=len(dst), n_graphs=1, edge_attr_dim=2)
    graph = batch_graphs(
        [pad_graph(
            spec,
            node_feat=np.concatenate(
                [np.linalg.norm(vel, axis=1, keepdims=True), q / q.max()], axis=1
            ),
            coord=loc, vel=vel, dst=dst, src=src,
            edge_attr=np.concatenate([d0, d0], axis=1),
            coord_target=loc + vel, node_attr=q,
        )],
        spec,
    )

    model = get_model(
        args.model, hidden=args.dim_hidden, n_layers=args.num_layer,
        virtual_channels=args.virtual_channel,
    )
    params = model.init(jax.random.key(args.seed), graph)["params"]

    def fwd(g):
        out = model.apply({"params": params}, g)
        return out[0] if isinstance(out, tuple) else out

    ok = True
    for trial in range(args.trials):
        R = jnp.asarray(random_rotation(rng), jnp.float32)
        t = jnp.asarray(rng.normal(size=3), jnp.float32)
        g_rt = graph.replace(
            coord=graph.coord @ R + t,
            vel=graph.vel @ R,
            coord_target=graph.coord_target @ R + t,
            loc_mean=jnp.einsum("ji,bjc->bic", R, graph.loc_mean)
            + t[None, :, None],
        )
        err = float(jnp.abs(fwd(g_rt) - (fwd(graph) @ R + t)).max())
        passed = err <= args.atol
        ok &= passed
        print(f"trial {trial}: max |f(xR+t) - f(x)R - t| = {err:.3e} "
              f"{'PASS' if passed else 'FAIL'}")
    print("Equivariance test:", "PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
