"""Graph parallelism: edge/node-sharded training over a mesh axis.

The GNN analogue of sequence/context parallelism (SURVEY.md §5): a large
graph's *edges* are partitioned across devices (compute scales as E/G), node
state stays replicated, and exactness is maintained with reduce-scatter /
psum / all-gather collectives inside the layer (see
``models/fast_egnn.py`` ``shard_axis``).

Host-side layout: like data parallelism, a sharded batch is the same
GraphBatch stacked G times along a leading mesh-sharded axis — node arrays
identical in every slot, edge arrays partitioned into contiguous (dst-sorted)
slices.  Inside ``shard_map`` each device drops the leading axis and sees its
local edge shard + the full node arrays.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.train.step import TrainState, make_loss_fn


def shard_graph_batch(batch: GraphBatch, n_shards: int) -> GraphBatch:
    """Stack ``n_shards`` copies with edges partitioned into contiguous slices.

    Edge capacity must divide by ``n_shards`` (pad the GraphSpec accordingly);
    node capacity must divide too (checked at model time).
    """
    E = batch.num_edges
    if E % n_shards:
        raise ValueError(f"edge capacity {E} not divisible by {n_shards}")
    e_loc = E // n_shards

    edge_keys = {"dst", "src", "edge_attr", "edge_mask"}

    def stack(leaf_name, arr):
        if leaf_name in edge_keys:
            return jnp.stack(
                [arr[i * e_loc : (i + 1) * e_loc] for i in range(n_shards)]
            )
        return jnp.broadcast_to(arr[None], (n_shards,) + arr.shape)

    kwargs = {}
    for name in [
        "node_feat", "coord", "vel", "node_mask", "graph_id",
        "dst", "src", "edge_attr", "edge_mask",
        "coord_target", "loc_mean",
    ]:
        kwargs[name] = stack(name, getattr(batch, name))
    for opt in ["node_attr", "virtual_fibonacci"]:
        val = getattr(batch, opt)
        kwargs[opt] = None if val is None else stack(opt, val)
    # per-shard partial in-degrees (summed to the global count by the layer's
    # reduce-scatter)
    N = batch.num_nodes
    dst_np = np.asarray(batch.dst)
    src_np = np.asarray(batch.src)
    mask_np = np.asarray(batch.edge_mask)
    if batch.dst_count is not None:
        parts = []
        for i in range(n_shards):
            sl = slice(i * e_loc, (i + 1) * e_loc)
            parts.append(
                np.bincount(
                    dst_np[sl][mask_np[sl]], minlength=N + 1
                )[:N].astype(np.float32)
            )
        kwargs["dst_count"] = jnp.asarray(np.stack(parts))
    # per-shard Pallas CSR tables (local edge slices stay dst-sorted)
    if batch.csr_dst is not None and e_loc % batch.csr_dst.chunk == 0:
        from fastegnn_tpu.ops.spmm import make_csr_meta

        rows, chunk = batch.csr_dst.rows, batch.csr_dst.chunk
        metas_d, metas_s, perms, ssorts = [], [], [], []
        for i in range(n_shards):
            sl = slice(i * e_loc, (i + 1) * e_loc)
            metas_d.append(make_csr_meta(dst_np[sl], N, rows, chunk))
            masked_src = np.where(mask_np[sl], src_np[sl], N)
            perm = np.argsort(masked_src, kind="stable").astype(np.int32)
            ssort = masked_src[perm].astype(np.int32)
            metas_s.append(make_csr_meta(ssort, N, rows, chunk))
            perms.append(perm)
            ssorts.append(ssort)
        kwargs["csr_dst"] = jax.tree.map(lambda *xs: jnp.stack(xs), *metas_d)
        kwargs["csr_src"] = jax.tree.map(lambda *xs: jnp.stack(xs), *metas_s)
        kwargs["src_perm"] = jnp.asarray(np.stack(perms))
        kwargs["src_sorted"] = jnp.asarray(np.stack(ssorts))
    return GraphBatch(n_graphs=batch.n_graphs, **kwargs)


def make_gp_train_step(
    model,                       # constructed with shard_axis=graph_axis
    tx: optax.GradientTransformation,
    mesh: Mesh,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    graph_axis: str = "graph",
    data_axis: Optional[str] = None,
) -> Callable:
    """Jitted ``step(state, sharded_batch, key) -> (state, metrics)``.

    ``sharded_batch`` leaves carry leading mesh axes: ``[G, ...]`` (graph
    only) or ``[D, G, ...]`` (data x graph).  Model outputs are replicated
    across the graph axis, so the per-shard losses are identical and the
    exact parameter gradient is the ``pmean`` over the graph axis (each
    shard's partial flows through the collectives' transposes).
    """
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling, use_mmd)
    axes = ([data_axis] if data_axis else []) + [graph_axis]

    def local_step(state: TrainState, batch_stacked, key):
        graph = jax.tree.map(
            lambda x: x[(0,) * len(axes)], batch_stacked
        )
        if data_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        (total, (mse, mmd)), grads = jax.value_and_grad(
            lambda pf, g, k: loss_fn(state.unravel(pf), g, k), has_aux=True
        )(state.flat_params, graph, key)
        for a in axes:
            grads = jax.lax.pmean(grads, a)
        metrics = {"loss": total, "mse": mse, "mmd": mmd}
        if data_axis is not None:
            metrics = {k: jax.lax.pmean(v, data_axis) for k, v in metrics.items()}
        updates, opt_state = tx.update(grads, state.opt_state, state.flat_params)
        flat = optax.apply_updates(state.flat_params, updates)
        new_state = state.replace(
            flat_params=flat, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    batch_spec = P(*axes)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_gp_forward(
    model,
    mesh: Mesh,
    graph_axis: str = "graph",
) -> Callable:
    """Jitted graph-parallel forward: ``fn(params, sharded_batch) -> (x, vx)``."""

    def local_fwd(params, batch_stacked):
        graph = jax.tree.map(lambda x: x[0], batch_stacked)
        return model.apply({"params": params}, graph)

    sharded = jax.shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P(graph_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
