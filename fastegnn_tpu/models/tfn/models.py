"""TFN / SE(3)-Transformer model wrappers + the dynamics adapter.

Re-design of reference ``se3_dynamics/models.py`` and ``dynamics.py``.
Type-1 features are plain (x, y, z) vectors at the model boundary; they are
permuted to the real-SH (y, z, x) order internally (so3.py conventions) and
back on output — an orthogonal change of basis that keeps the models exactly
SE(3)-equivariant.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import Linear
from fastegnn_tpu.models.tfn.layers import (
    Fiber,
    G1x1SE3,
    GConvSE3,
    GNormSE3,
    GSE3Res,
    compute_basis,
)
from fastegnn_tpu.ops.segment import graph_mean_pool

_TO_SH = (1, 2, 0)    # (x,y,z) -> (y,z,x)
_FROM_SH = (2, 0, 1)  # inverse


def vec_to_sh(v):
    return v[..., _TO_SH]


def vec_from_sh(v):
    return v[..., _FROM_SH]


def _edge_geometry(graph: GraphBatch, max_degree: int):
    """Relative vectors (reference ``dynamics.py:93``: x[col]-x[row] =
    x[src]-x[dst]), distances, and the kernel basis."""
    d = graph.coord[graph.src] - graph.coord[graph.dst]
    # padded edges: zero vector -> unitized arbitrarily; masked downstream
    r = jnp.linalg.norm(d, axis=-1, keepdims=True)
    # NOTE: real_sph_harm_all takes raw cartesian (x, y, z); only *type-1
    # features* use the SH (y, z, x) component order.
    basis = compute_basis(d, max_degree)
    return r, basis


class OursTFN(fnn.Module):
    """TFN over (type-0 charges, type-1 velocity) -> requested output types
    (reference ``models.py:79-152``)."""

    num_layers: int
    num_channels: int
    num_nlayers: int = 1
    num_degrees: int = 2
    edge_dim: int = 0
    in_types: Tuple[Tuple[int, int], ...] = ((1, 0), (1, 1))   # (mult, deg)
    out_types: Tuple[Tuple[int, int], ...] = ((1, 1),)

    @fnn.compact
    def __call__(self, h: Dict[int, jax.Array], graph: GraphBatch):
        r, basis = _edge_geometry(graph, self.num_degrees - 1)
        mid = tuple(
            (self.num_channels, d) for d in range(self.num_degrees)
        )
        fin = self.in_types
        for i in range(self.num_layers - 1):
            h = GConvSE3(fin, mid, self_interaction=True,
                         edge_dim=self.edge_dim, name=f"conv_{i}")(
                h, graph, r, basis
            )
            h = GNormSE3(mid, num_layers=self.num_nlayers,
                         name=f"norm_{i}")(h)
            fin = mid
        h = GConvSE3(fin, self.out_types, self_interaction=True,
                     edge_dim=self.edge_dim, name="conv_out")(
            h, graph, r, basis
        )
        return h


class OurSE3Transformer(fnn.Module):
    """SE(3)-Transformer variant with the reference's ``scalar_trick``
    output scaling (``models.py:207-295``)."""

    num_layers: int
    num_channels: int
    num_degrees: int = 2
    edge_dim: int = 0
    div: float = 1
    n_heads: int = 1
    in_types: Tuple[Tuple[int, int], ...] = ((1, 0), (1, 1))
    out_types: Tuple[Tuple[int, int], ...] = ((1, 1),)

    @fnn.compact
    def __call__(self, h: Dict[int, jax.Array], graph: GraphBatch):
        r, basis = _edge_geometry(graph, self.num_degrees - 1)
        mid = tuple((self.num_channels, d) for d in range(self.num_degrees))
        fin = self.in_types
        for i in range(self.num_layers):
            h = GSE3Res(fin, mid, edge_dim=self.edge_dim, div=self.div,
                        n_heads=self.n_heads, name=f"res_{i}")(
                h, graph, r, basis
            )
            h = GNormSE3(mid, name=f"norm_{i}")(h)
            fin = mid
        h = GConvSE3(fin, self.out_types, self_interaction=True,
                     edge_dim=self.edge_dim, name="conv_out")(
            h, graph, r, basis
        )
        scalar_trick = self.param(
            "scalar_trick", lambda k, s: jnp.ones(s) * 0.01, (1,)
        )
        return {k: v * scalar_trick for k, v in h.items()}


class TFN(fnn.Module):
    """Scalar-output TFN with max pooling (reference ``models.py:15-77``)."""

    num_layers: int
    atom_feature_size: int
    num_channels: int
    num_nlayers: int = 1
    num_degrees: int = 4
    edge_dim: int = 0
    out_dim: int = 1

    @fnn.compact
    def __call__(self, node_feat: jax.Array, graph: GraphBatch):
        r, basis = _edge_geometry(graph, self.num_degrees - 1)
        fin = ((self.atom_feature_size, 0),)
        mid = tuple((self.num_channels, d) for d in range(self.num_degrees))
        fout = ((self.num_channels * self.num_degrees, 0),)
        h = {0: node_feat[..., None]}
        for i in range(self.num_layers - 1):
            h = GConvSE3(fin, mid, self_interaction=True,
                         edge_dim=self.edge_dim, name=f"conv_{i}")(
                h, graph, r, basis
            )
            h = GNormSE3(mid, num_layers=self.num_nlayers,
                         name=f"norm_{i}")(h)
            fin = mid
        h = GConvSE3(fin, fout, self_interaction=True,
                     edge_dim=self.edge_dim, name="conv_out")(h, graph, r, basis)
        scalars = h[0][..., -1]  # [N, C]
        # per-graph max pooling over real nodes
        neg = jnp.finfo(scalars.dtype).min
        masked = jnp.where(graph.node_mask[:, None], scalars, neg)
        pooled = jax.ops.segment_max(
            masked, graph.graph_id, num_segments=graph.n_graphs + 1
        )[: graph.n_graphs]
        y = fnn.relu(Linear(scalars.shape[-1], name="fc0")(pooled))
        return Linear(self.out_dim, name="fc1")(y)


class SE3Transformer(fnn.Module):
    """Scalar-output SE(3)-Transformer with avg pooling
    (reference ``models.py:144-205``)."""

    num_layers: int
    atom_feature_size: int
    num_channels: int
    num_degrees: int = 4
    edge_dim: int = 0
    div: float = 4
    n_heads: int = 1
    out_dim: int = 1

    @fnn.compact
    def __call__(self, node_feat: jax.Array, graph: GraphBatch):
        r, basis = _edge_geometry(graph, self.num_degrees - 1)
        fin = ((self.atom_feature_size, 0),)
        mid = tuple((self.num_channels, d) for d in range(self.num_degrees))
        fout = ((self.num_channels * self.num_degrees, 0),)
        h = {0: node_feat[..., None]}
        for i in range(self.num_layers):
            h = GSE3Res(fin, mid, edge_dim=self.edge_dim, div=self.div,
                        n_heads=self.n_heads, name=f"res_{i}")(h, graph, r, basis)
            h = GNormSE3(mid, name=f"norm_{i}")(h)
            fin = mid
        h = GConvSE3(fin, fout, self_interaction=True,
                     edge_dim=self.edge_dim, name="conv_out")(h, graph, r, basis)
        scalars = h[0][..., -1]
        pooled = graph_mean_pool(
            scalars, graph.graph_id, graph.n_graphs, graph.node_mask
        )
        y = fnn.relu(Linear(scalars.shape[-1], name="fc0")(pooled))
        return Linear(self.out_dim, name="fc1")(y)


class OurDynamics(fnn.Module):
    """Velocity-integrating wrapper (reference ``dynamics.py:10-107``):
    features f = charges (type-0), f1 = velocity (type-1); prediction =
    type-1 output + positions.  ``__call__(graph) -> coords [N, 3]``."""

    nf: int = 32
    n_layers: int = 4
    model: str = "tfn"                  # "tfn" | "se3_transformer"
    num_degrees: int = 2
    div: float = 1

    @fnn.compact
    def __call__(self, graph: GraphBatch):
        charges = (
            graph.node_attr
            if graph.node_attr is not None
            else graph.node_feat[:, :1]
        )
        h = {
            0: charges[..., None],                       # [N, 1, 1]
            1: vec_to_sh(graph.vel)[:, None, :],         # [N, 1, 3]
        }
        if self.model == "tfn":
            net = OursTFN(
                num_layers=self.n_layers, num_channels=self.nf,
                num_degrees=self.num_degrees, edge_dim=0, name="se3",
            )
        elif self.model == "se3_transformer":
            net = OurSE3Transformer(
                num_layers=self.n_layers, num_channels=self.nf,
                num_degrees=self.num_degrees, div=self.div, edge_dim=0,
                name="se3",
            )
        else:
            raise ValueError(f"wrong model {self.model!r}")
        out = net(h, graph)
        return vec_from_sh(out[1][:, 0, :]) + graph.coord
