"""Data parallelism over graphs: shard_map-ed train/eval steps.

Entirely new capability (the reference is one process on one device,
SURVEY.md §2c).  Design: a *sharded batch* is a GraphBatch pytree whose
leaves carry a leading ``data``-sharded axis of size D, one independent
sub-batch per device (graphs never straddle shards, so the only collectives
are gradient/metric ``pmean`` — graph pooling stays local).  Single-device
model code is reused verbatim inside ``shard_map``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.train.step import TrainState, make_loss_fn


def stack_shards(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack per-device GraphBatches into one pytree with leading axis D."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def shard_batch_for_mesh(batch_stacked: GraphBatch, mesh: Mesh, axis="data"):
    """Place a stacked batch so the leading axis (or axes, if ``axis`` is a
    tuple) lives on the named mesh axis(es)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    sharding = NamedSharding(mesh, P(*axes))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        batch_stacked,
    )


def _unstack_local(batch_stacked: GraphBatch) -> GraphBatch:
    """Inside shard_map each device sees a [1, ...] local block; drop it."""
    return jax.tree.map(lambda x: x[0], batch_stacked)


def make_dp_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    axis: str = "data",
) -> Callable:
    """Returns jitted ``step(state, stacked_batch, key) -> (state, metrics)``.

    ``state`` is replicated; ``stacked_batch`` leaves are [D, ...] sharded on
    ``axis``; gradients and metrics are ``pmean``-ed across the axis.
    """
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling, use_mmd)

    def local_step(state: TrainState, batch_stacked, key):
        from fastegnn_tpu.train.step import ensure_key

        key = ensure_key(key)
        graph = _unstack_local(batch_stacked)
        # decorrelate MMD sampling across shards
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (total, (mse, mmd)), grads = jax.value_and_grad(
            lambda pf, g, k: loss_fn(state.unravel(pf), g, k), has_aux=True
        )(state.flat_params, graph, key)
        grads = jax.lax.pmean(grads, axis)  # ONE flat-vector collective
        metrics = {
            "loss": jax.lax.pmean(total, axis),
            "mse": jax.lax.pmean(mse, axis),
            "mmd": jax.lax.pmean(mmd, axis),
        }
        updates, opt_state = tx.update(grads, state.opt_state, state.flat_params)
        flat = optax.apply_updates(state.flat_params, updates)
        new_state = state.replace(
            flat_params=flat, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_eval_step(
    model,
    mesh: Mesh,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    axis: str = "data",
) -> Callable:
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling, use_mmd)

    def local_eval(params, batch_stacked, key):
        from fastegnn_tpu.train.step import ensure_key

        key = ensure_key(key)
        graph = _unstack_local(batch_stacked)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        total, (mse, mmd) = loss_fn(params, graph, key)
        return {
            "loss": jax.lax.pmean(total, axis),
            "mse": jax.lax.pmean(mse, axis),
            "mmd": jax.lax.pmean(mmd, axis),
        }

    sharded = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def iter_dp_batches(
    dataset,
    batch_size: int,
    mesh: Mesh,
    data: int,
    rng: np.random.Generator | None = None,
    drop_last: bool = True,
):
    """Yield mesh-placed [D, ...]-stacked batches (the CLI ``--mesh data=D``
    path).  Global batch semantics match ``dataset.iter_batches(batch_size)``
    (shuffle + drop_last); each global batch splits into D contiguous
    sub-batches of ``batch_size / D`` graphs.

    The fused edge-kernel slot metas (ek5) have data-dependent sizes, so
    they cannot be stacked across shards; this path clears them and the
    per-shard model runs the Pallas-CSR (or plain segment) edge path.
    """
    import dataclasses

    if batch_size % data:
        raise ValueError(
            f"batch size {batch_size} not divisible by data axis {data}")
    per = batch_size // data
    order = np.arange(len(dataset))
    if rng is not None:
        rng.shuffle(order)
    n = len(order)
    end = n - (n % batch_size) if drop_last else n
    sharding = NamedSharding(mesh, P("data"))
    for lo in range(0, end, batch_size):
        idx = order[lo:lo + batch_size]
        subs = [
            dataclasses.replace(
                dataset.collate(list(idx[d * per:(d + 1) * per])),
                ek5=None, ek5_groups=None, ek5_group_rows=None)
            for d in range(data)
        ]
        stacked = stack_shards(subs) if data > 1 else subs[0]
        if data > 1:
            stacked = jax.tree.map(
                lambda x: jax.device_put(x, sharding)
                if hasattr(x, "shape") else x,
                stacked,
            )
        yield stacked


