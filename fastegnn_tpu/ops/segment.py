"""Masked segment reductions — the aggregation substrate of every model.

The reference's aggregation backbone is ``scatter_add_`` wrapped as
``unsorted_segment_sum`` / ``unsorted_segment_mean`` (reference
``models/FastEGNN.py:279-294``, duplicated across the model zoo) plus PyG's
``global_mean_pool`` for per-graph pooling (``models/FastEGNN.py:4,148,170``).
Those are CUDA scatter kernels; on TPU the same semantics are expressed as
``jax.ops.segment_sum`` over edge arrays sorted by destination, which XLA
lowers well when ``indices_are_sorted`` holds.  Means divide by *masked*
counts clamped to >= 1 — exactly the reference's ``count.clamp(min=1)``
(``models/FastEGNN.py:294``), which also makes padded segments yield 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _mask_rows(data: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return data
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    return data * mask.reshape(shape).astype(data.dtype)


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum of ``data`` rows into ``num_segments`` buckets; masked rows add 0."""
    return jax.ops.segment_sum(
        _mask_rows(data, mask),
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_count(
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    ones = (
        mask.astype(jnp.float32)
        if mask is not None
        else jnp.ones(segment_ids.shape, jnp.float32)
    )
    return jax.ops.segment_sum(
        ones,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Per-segment mean with count clamped to >= 1 (empty segments -> 0).

    Matches reference ``unsorted_segment_mean`` (``models/FastEGNN.py:287-294``).
    """
    total = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    count = segment_count(segment_ids, num_segments, mask, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - 1)).astype(
        total.dtype
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Numerically stable per-segment softmax (DGL ``edge_softmax`` equivalent,
    reference ``se3_dynamics/equivariant_attention/modules.py:542``).

    Masked rows get probability 0 and do not contribute to the normaliser.
    """
    neg = jnp.finfo(logits.dtype).min
    masked_logits = logits if mask is None else jnp.where(
        mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim)), logits, neg
    )
    seg_max = jax.ops.segment_max(
        masked_logits,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = masked_logits - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    expd = _mask_rows(expd, mask)
    denom = jax.ops.segment_sum(
        expd,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    denom = jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)
    return expd / denom[segment_ids]


def graph_sum_pool(
    data: jax.Array,
    graph_id: jax.Array,
    n_graphs: int,
    node_mask: Optional[jax.Array] = None,
    axis: Optional[str] = None,
) -> jax.Array:
    """Per-graph sum over nodes -> [B, ...].  ``graph_id`` may contain the
    dump segment ``n_graphs`` for padded nodes; it is computed then dropped.

    With ``axis`` set (inside shard_map, nodes sharded over that mesh axis),
    partial per-shard sums are ``psum``-ed into the exact global pool.
    """
    out = segment_sum(
        data, graph_id, n_graphs + 1, mask=node_mask, indices_are_sorted=True
    )
    out = out[:n_graphs]
    if axis is not None:
        out = jax.lax.psum(out, axis)
    return out


def graph_mean_pool(
    data: jax.Array,
    graph_id: jax.Array,
    n_graphs: int,
    node_mask: Optional[jax.Array] = None,
    axis: Optional[str] = None,
) -> jax.Array:
    """Per-graph mean over *real* nodes -> [B, ...]; PyG ``global_mean_pool``
    equivalent (reference ``models/FastEGNN.py:148,170,212``).

    With ``axis`` set, sums and counts are ``psum``-ed across the mesh axis
    before dividing, keeping the mean exact under node sharding.
    """
    total = segment_sum(
        data, graph_id, n_graphs + 1, mask=node_mask, indices_are_sorted=True
    )[:n_graphs]
    count = segment_count(
        graph_id, n_graphs + 1, mask=node_mask, indices_are_sorted=True
    )[:n_graphs]
    if axis is not None:
        total = jax.lax.psum(total, axis)
        count = jax.lax.psum(count, axis)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - 1)).astype(
        total.dtype
    )
