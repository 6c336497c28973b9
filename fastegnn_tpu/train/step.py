"""Jitted train / eval step builders.

One fused step = forward + loss (+ MMD) + backward + Adam update, compiled
once per GraphSpec bucket.  The reference's per-batch Python dispatch
(``utils/train.py:51-102``) becomes a model-specific closure built once.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.train.loss import masked_mse, mmd_loss


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _forward(model, params, graph: GraphBatch):
    return model.apply({"params": params}, graph)


def make_loss_fn(
    model,
    sigma: float,
    weight: float,
    sample: int,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    apply_fn: Optional[Callable] = None,
) -> Callable:
    """Returns ``loss_fn(params, batch, key) -> (total_loss, (mse, mmd))``.

    ``mse`` is the *logged* loss (pre-MMD), matching the reference's split
    (``utils/train.py:104-108,163-165``).

    ``apply_fn(params, batch) -> prediction`` overrides the default
    ``model.apply({"params": p}, batch)`` for models with non-uniform
    signatures (EGHN's local bond edges, DimeNet's triplet tables — the
    reference's per-class dispatch, ``utils/train.py:51-102``).  ``batch``
    may then be a (GraphBatch, aux...) tuple; the GraphBatch must come first.
    """

    def loss_fn(params, batch, key):
        graph = batch[0] if isinstance(batch, tuple) else batch
        if apply_fn is not None:
            out = apply_fn(params, batch)
        else:
            out = _forward(model, params, graph)
        if isinstance(out, tuple):
            pred, vloc = out[0], out[1] if len(out) > 1 else None
        else:
            pred, vloc = out, None
        mse = masked_mse(pred, graph.coord_target, graph.node_mask)
        if use_mmd and vloc is not None:
            mmd = mmd_loss(
                pred, vloc, graph, key, sigma, sample, per_graph_sampling
            )
            total = mse + weight * mmd
        else:
            mmd = jnp.zeros_like(mse)
            total = mse
        return total, (mse, mmd)

    return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    donate: bool = True,
    apply_fn: Optional[Callable] = None,
) -> Callable[[TrainState, GraphBatch, jax.Array], Tuple[TrainState, dict]]:
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling,
                           use_mmd, apply_fn)

    def step(state: TrainState, graph, key):
        (total, (mse, mmd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, graph, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": total, "mse": mse, "mmd": mmd}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    apply_fn: Optional[Callable] = None,
) -> Callable[[Any, GraphBatch, jax.Array], dict]:
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling,
                           use_mmd, apply_fn)

    @jax.jit
    def step(params, graph, key):
        total, (mse, mmd) = loss_fn(params, graph, key)
        return {"loss": total, "mse": mse, "mmd": mmd}

    return step
