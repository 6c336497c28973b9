"""Shared test utilities: random geometric graphs and batch builders."""

from __future__ import annotations

import numpy as np

from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
from fastegnn_tpu.ops.neighbors import cutoff_edges_np


def random_raw_graph(rng: np.random.Generator, n: int, cutoff_rate: float = 0.0):
    """One random charged-particle style graph (node_feat = [|v|, q/qmax])."""
    loc = rng.normal(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    charges = rng.choice([-1.0, 1.0], size=(n, 1)).astype(np.float32)
    loc_t = loc + vel + 0.1 * rng.normal(size=(n, 3)).astype(np.float32)
    dst, src = cutoff_edges_np(loc, cutoff_rate)
    d0 = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True).astype(np.float32)
    # reference edge_attr at train time = [initial_dist, current_dist]
    # (datasets/nbody/dataset.py:88 + utils/train.py:41-43); equal at t=0
    edge_attr = np.concatenate([d0, d0], axis=1)
    node_feat = np.concatenate(
        [np.linalg.norm(vel, axis=1, keepdims=True), charges / charges.max()], axis=1
    ).astype(np.float32)
    return dict(
        node_feat=node_feat,
        coord=loc,
        vel=vel,
        dst=dst,
        src=src,
        edge_attr=edge_attr,
        coord_target=loc_t,
        node_attr=charges,
    )


def make_batch(
    rng: np.random.Generator,
    n_graphs: int = 2,
    n_nodes: int = 8,
    cutoff_rate: float = 0.0,
    pad_nodes: int = 0,
    pad_edges: int = 0,
    virtual_channels: int = 3,
):
    raws = [random_raw_graph(rng, n_nodes, cutoff_rate) for _ in range(n_graphs)]
    max_e = max(r["dst"].shape[0] for r in raws) + pad_edges
    spec = GraphSpec(
        max_nodes=n_nodes + pad_nodes,
        max_edges=max_e,
        n_graphs=n_graphs,
        node_feat_dim=2,
        edge_attr_dim=2,
        virtual_channels=virtual_channels,
    )
    padded = [pad_graph(spec, **r) for r in raws]
    return batch_graphs(padded, spec), raws, spec
