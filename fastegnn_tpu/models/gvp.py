"""Geometric Vector Perceptron GNN (drorlab/gvp-pytorch style).

Re-design of reference ``models/GVP.py``.  Features are (scalar, vector)
tuples ``(s [N, S], V [N, Vc, 3])``:

- ``GVPCell`` (``GVP.py:89-153``): vector channels mixed by a bias-free
  linear over the channel axis; their norms join the scalar path; optional
  vector gating.
- ``GVPConvolution`` (``GVP.py:222-286``): messages
  ``GVP^n([s_j, e_s, s_i], [V_j, e_V, V_i])`` aggregated by *mean at the PyG
  target* = our ``src`` (PyG flow source->target, source = edge_index[0] =
  our ``dst``).
- ``GVPConvBlock`` (``GVP.py:289-384``): residual + tuple LayerNorm +
  feedforward with dropout.
- ``GVPNet`` (``GVP.py:388-456``): input/output GVP stacks; training wiring
  (``utils/train.py:90-95``): node tuple = (node_feat, [loc, vel]), edge
  tuple = (edge_attr, [loc_dst - loc_src]); prediction = first output vector
  channel.

Dropout follows the reference's train/eval split: pass ``train=True`` and an
``rngs={'dropout': key}`` to enable.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import Linear
from fastegnn_tpu.ops.segment import segment_mean

TupleSV = Tuple[jax.Array, jax.Array]  # (s [.., S], V [.., Vc, 3])


def _norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    out = jnp.maximum(jnp.sum(x**2, axis=axis, keepdims=keepdims), eps)
    return jnp.sqrt(out) if sqrt else out


class GVPCell(fnn.Module):
    """One geometric vector perceptron (``GVP.py:89-153``)."""

    out_s: int
    out_v: int
    h_dim: Optional[int] = None
    scalar_act: Optional[str] = "relu"
    vector_act: Optional[str] = "sigmoid"
    vector_gate: bool = False

    @fnn.compact
    def __call__(self, x: TupleSV) -> TupleSV:
        s, v = x
        vi = v.shape[-2]
        if vi:
            h_dim = self.h_dim or max(vi, self.out_v)
            vT = jnp.swapaxes(v, -1, -2)                       # [.., 3, Vc]
            vh = Linear(h_dim, use_bias=False, name="wh")(vT)  # [.., 3, h]
            vn = _norm_no_nan(vh, axis=-2)                     # [.., h]
            s = Linear(self.out_s, name="ws")(jnp.concatenate([s, vn], -1))
            if self.out_v:
                vout = Linear(self.out_v, use_bias=False, name="wv")(vh)
                vout = jnp.swapaxes(vout, -1, -2)              # [.., Vo, 3]
                if self.vector_gate:
                    gate_in = fnn.sigmoid(s) if self.vector_act else s
                    gate = Linear(self.out_v, name="wsv")(gate_in)
                    vout = vout * fnn.sigmoid(gate)[..., None]
                elif self.vector_act:
                    vout = vout * fnn.sigmoid(
                        _norm_no_nan(vout, axis=-1, keepdims=True)
                    )
        else:
            s = Linear(self.out_s, name="ws")(s)
            if self.out_v:
                vout = jnp.zeros(s.shape[:-1] + (self.out_v, 3), s.dtype)
        if self.scalar_act:
            s = fnn.relu(s)
        return (s, vout) if self.out_v else (s, jnp.zeros(s.shape[:-1] + (0, 3), s.dtype))


class TupleLayerNorm(fnn.Module):
    """LayerNorm on scalars; vector channels normalised by their RMS norm
    (``GVP.py:199-220``)."""

    @fnn.compact
    def __call__(self, x: TupleSV) -> TupleSV:
        s, v = x
        # torch nn.LayerNorm default eps (1e-5; flax defaults to 1e-6)
        s = fnn.LayerNorm(epsilon=1e-5, name="scalar_norm")(s)
        if v.shape[-2] == 0:
            return s, v
        vn = _norm_no_nan(v, axis=-1, keepdims=True, sqrt=False)
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True))
        return s, v / vn


class TupleDropout(fnn.Module):
    """Scalar dropout + whole-vector-channel dropout (``GVP.py:155-197``)."""

    rate: float

    @fnn.compact
    def __call__(self, x: TupleSV, deterministic: bool) -> TupleSV:
        s, v = x
        s = fnn.Dropout(self.rate, deterministic=deterministic, name="sdrop")(s)
        if not deterministic and self.rate > 0.0 and v.shape[-2]:
            key = self.make_rng("dropout")
            keep = jax.random.bernoulli(key, 1.0 - self.rate, v.shape[:-1])
            v = v * keep[..., None] / (1.0 - self.rate)
        return s, v


def _gvp_stack(in_tuple, dims: Sequence[Tuple[int, int]], final_act=False,
               vector_gate=False, name_prefix="gvp"):
    """Chain of GVPCells; the last has no activations (``GVP.py:253-267``)."""
    x = in_tuple
    n = len(dims)
    for i, (so, vo) in enumerate(dims):
        last = i == n - 1 and not final_act
        x = GVPCell(
            so, vo,
            scalar_act=None if last else "relu",
            vector_act=None if last else "sigmoid",
            vector_gate=vector_gate,
            name=f"{name_prefix}{i}",
        )(x)
    return x


class GVPConvolution(fnn.Module):
    """Message passing with GVP message function (``GVP.py:222-286``)."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    n_layers: int = 3

    @fnn.compact
    def __call__(self, x: TupleSV, edge_attr: TupleSV, graph: GraphBatch) -> TupleSV:
        s, v = x
        dst, src = graph.dst, graph.src
        es, ev = edge_attr
        # tuple_cat((s_j, v_j), edge_attr, (s_i, v_i)); PyG j=row=dst, i=col=src
        ms = jnp.concatenate([s[dst], es, s[src]], axis=-1)
        mv = jnp.concatenate([v[dst], ev, v[src]], axis=-2)
        dims = [self.node_dims] * self.n_layers
        out_s, out_v = _gvp_stack((ms, mv), dims, name_prefix="message")
        # aggregate mean at PyG target = src
        agg_s = segment_mean(out_s, src, s.shape[0], mask=graph.edge_mask)
        agg_v = segment_mean(out_v, src, s.shape[0], mask=graph.edge_mask)
        return agg_s, agg_v


class GVPConvBlock(fnn.Module):
    """Residual conv + feedforward block (``GVP.py:289-384``)."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    n_message: int = 3
    n_feedforward: int = 2
    drop_rate: float = 0.1

    @fnn.compact
    def __call__(self, x: TupleSV, edge_attr: TupleSV, graph: GraphBatch,
                 deterministic: bool = True) -> TupleSV:
        dh = GVPConvolution(self.node_dims, self.edge_dims, self.n_message,
                            name="conv")(x, edge_attr, graph)
        dh = TupleDropout(self.drop_rate, name="drop0")(dh, deterministic)
        x = TupleLayerNorm(name="norm0")((x[0] + dh[0], x[1] + dh[1]))
        ns, nv = self.node_dims
        hid = (4 * ns, 2 * nv)
        ff_dims = ([self.node_dims] if self.n_feedforward == 1
                   else [hid] * (self.n_feedforward - 1) + [self.node_dims])
        dh = _gvp_stack(x, ff_dims, name_prefix="ff")
        dh = TupleDropout(self.drop_rate, name="drop1")(dh, deterministic)
        x = TupleLayerNorm(name="norm1")((x[0] + dh[0], x[1] + dh[1]))
        return x


class GVPNet(fnn.Module):
    """``__call__(graph) -> (coord_pred [N,3], (s, V) output tuple)``.

    Config defaults follow ``main_nbody.py:122``: node (2,2)->(100,16),
    edge (2,1)->(32,4).
    """

    node_h_dim: Tuple[int, int] = (100, 16)
    edge_h_dim: Tuple[int, int] = (32, 4)
    n_layers: int = 4
    drop_rate: float = 0.1

    @fnn.compact
    def __call__(self, graph: GraphBatch, train: bool = False):
        det = not train
        # input tuples (utils/train.py:90-93)
        s = graph.node_feat
        v = jnp.stack([graph.coord, graph.vel], axis=-2)          # [N, 2, 3]
        es = graph.edge_attr
        ev = (graph.coord[graph.dst] - graph.coord[graph.src])[:, None, :]

        hv = TupleLayerNorm(name="wv_norm")((s, v))
        hv = GVPCell(*self.node_h_dim, scalar_act=None, vector_act=None,
                     name="wv_gvp")(hv)
        he = TupleLayerNorm(name="we_norm")((es, ev))
        he = GVPCell(*self.edge_h_dim, scalar_act=None, vector_act=None,
                     name="we_gvp")(he)

        for i in range(self.n_layers):
            hv = GVPConvBlock(self.node_h_dim, self.edge_h_dim,
                              drop_rate=self.drop_rate, name=f"layer_{i}")(
                hv, he, graph, deterministic=det
            )
        out = TupleLayerNorm(name="out_norm")(hv)
        out = GVPCell(*self.node_h_dim, name="out_gvp")(out)
        coord_pred = out[1][:, 0, :]  # first vector channel (utils/train.py:95)
        return coord_pred, out
