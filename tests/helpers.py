"""Shared test utilities: random geometric graphs and batch builders."""

from __future__ import annotations

import jax
import jax.numpy as jnp
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


# shared fused-edge-kernel oracle + geometry builder (used by the
# v5 kernel tests; reference math models/FastEGNN.py:102-133,180-189)
H_EDGE, FE_EDGE = 64, 2
H, FE = H_EDGE, FE_EDGE

def _ref_edge_block(h, x, dst, src, ea, W1, b1, W2, b2, Wg1, bg1, wg2):
    hd, hs = h[dst], h[src]
    diff = x[dst] - x[src]
    radial = jnp.sum(diff * diff, axis=1, keepdims=True)
    inp = jnp.concatenate([hd, hs, radial, ea], axis=1)
    m = jax.nn.silu(jax.nn.silu(inp @ W1 + b1) @ W2 + b2)
    gate = jax.nn.silu(m @ Wg1 + bg1) @ wg2
    N = h.shape[0]
    return (
        jax.ops.segment_sum(m, dst, num_segments=N),
        jax.ops.segment_sum(diff * gate, dst, num_segments=N),
    )


def _setup(n=260, deg=8, seed=0, isolate_tail=False):
    rng = np.random.default_rng(seed)
    loc = rng.normal(size=(n, 3)).astype(np.float32)
    d2 = ((loc[:, None] - loc[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :deg]
    dst = np.repeat(np.arange(n), deg).astype(np.int32)
    src = nbr.reshape(-1).astype(np.int32)
    if isolate_tail:
        # drop every edge whose dst lands in the last 128-row block, so
        # that block is never visited by a packed chunk (regression: the
        # kernel must still zero its output rows)
        keep = dst < (n - 1) // 128 * 128
        dst, src = dst[keep], src[keep]
    e = dst.size
    ea = (rng.normal(size=(e, FE)) * 0.3).astype(np.float32)
    w = [
        rng.normal(size=(2 * H + 1 + FE, H)) * 0.2,
        rng.normal(size=H) * 0.1,
        rng.normal(size=(H, H)) * 0.2,
        rng.normal(size=H) * 0.1,
        rng.normal(size=(H, H)) * 0.2,
        rng.normal(size=H) * 0.1,
        rng.normal(size=(H, 1)) * 0.1,
    ]
    w = [jnp.asarray(a, jnp.float32) for a in w]
    h = jnp.asarray(rng.normal(size=(n, H)) * 0.5, jnp.float32)
    return h, jnp.asarray(loc), dst, src, ea, w
