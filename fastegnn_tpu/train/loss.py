"""Losses: masked coordinate MSE and the MMD virtual-node auxiliary loss.

Reference semantics (``utils/train.py``):

- training loss = MSE(loc_predict, loc_t) (+ for the Fast* family)
  ``weight * (l_vv - l_rv)`` where ``l_vv = sum(k_vv)/B/C/C`` and
  ``l_rv = 2*sum(k_rv)/B/S/C`` (``utils/train.py:104,137-165``);
- the kernel is ``exp(-||x-y|| / (2 sigma^2))`` — *unsquared* distance
  (``utils/train.py:17-20``);
- the *logged* loss is the pure MSE, recorded before the MMD term is added
  (``utils/train.py:104-108``) — we reproduce that split by returning both;
- fixed-N datasets share one random node sample across the batch
  (``utils/train.py:150-153``); variable-N (Water-3D) samples per graph
  (``utils/train.py:123-138``, a Python loop there — vectorised here).

All computations are static-shape: node tensors reshape to ``[B, n_max, ...]``
(the batcher pads every graph slot to ``n_max``), sampling is top-k over
masked random scores, and padded rows are excluded by masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastegnn_tpu.graph import GraphBatch


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean squared error over real nodes only (torch ``nn.MSELoss`` on the
    unpadded arrays)."""
    m = mask.astype(pred.dtype)[:, None]
    se = ((pred - target) ** 2) * m
    denom = jnp.maximum(m.sum() * pred.shape[-1], 1.0)
    return se.sum() / denom


def rbf_kernel(x: jax.Array, y: jax.Array, sigma: float) -> jax.Array:
    """``exp(-||x - y|| / (2 sigma^2))`` pairwise over the last-but-one axis.

    x: [..., n, 3], y: [..., m, 3] -> [..., n, m].  Note the *unsquared*
    distance in the exponent (``utils/train.py:17-20``).
    """
    d2 = jnp.sum((x[..., :, None, :] - y[..., None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-24))
    return jnp.exp(-dist / (2.0 * sigma * sigma))


def mmd_loss(
    pred_coord: jax.Array,        # [N, 3] predicted positions
    virtual_coord: jax.Array,     # [B, 3, C] predicted virtual positions
    graph: GraphBatch,
    key: jax.Array,
    sigma: float,
    sample: int,
    per_graph_sampling: bool = False,
) -> jax.Array:
    """``l_vv - l_rv`` pulling virtual nodes toward the real-node distribution.

    ``sample * C`` real nodes are drawn per graph (shared across the batch for
    fixed-N parity unless ``per_graph_sampling``).
    """
    B = graph.n_graphs
    n_max = pred_coord.shape[0] // B
    vloc = jnp.transpose(virtual_coord, (0, 2, 1))  # [B, C, 3]
    C = vloc.shape[1]
    coords = pred_coord.reshape(B, n_max, 3)
    mask = graph.node_mask.reshape(B, n_max)
    s = min(sample * C, n_max)

    if per_graph_sampling:
        # top-s of random scores per graph, valid nodes first
        scores = jax.random.uniform(key, (B, n_max)) + (~mask) * 2.0
        _, idx = jax.lax.top_k(-scores, s)  # [B, s] smallest scores
        sampled = jnp.take_along_axis(coords, idx[..., None], axis=1)  # [B,s,3]
        smask = jnp.take_along_axis(mask, idx, axis=1)                 # [B,s]
    else:
        idx = jax.random.permutation(key, n_max)[:s]
        sampled = coords[:, idx, :]
        smask = mask[:, idx]

    k_vv = rbf_kernel(vloc, vloc, sigma)          # [B, C, C]
    k_rv = rbf_kernel(sampled, vloc, sigma)       # [B, s, C]
    k_rv = k_rv * smask[..., None]

    l_vv = jnp.sum(k_vv) / B / C / C
    l_rv = 2.0 * jnp.sum(k_rv) / B / s / C
    return l_vv - l_rv
