"""TFN / SE(3)-Transformer layers on the masked GraphBatch substrate.

Re-design of reference ``se3_dynamics/equivariant_attention/modules.py``
without DGL: degree-typed features are dicts ``{d: [N, mult, 2d+1]}``; all
message passing is masked segment ops.  The equivariant kernel basis is
built per edge from real spherical harmonics contracted with real
Clebsch-Gordan tables (see so3.py for why this spans the same kernels as
the reference's ``Q_J`` construction).

Edge/DGL convention mapping: the reference builds ``dgl.graph((row, col))``
with ``edata['d'] = x[col] - x[row]`` and aggregates at the DGL destination
(``dynamics.py:87-93``); in GraphBatch terms messages flow from ``dst`` and
aggregate (mean) at ``src`` with relative vector ``x[src] - x[dst]``.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import Linear
from fastegnn_tpu.models.tfn.so3 import real_clebsch_gordan, real_sph_harm_all
from fastegnn_tpu.ops.segment import segment_mean, segment_softmax, segment_sum


class Fiber:
    """Degree-typed feature structure: list of (multiplicity, degree)
    (reference ``fibers.py:13-44``)."""

    def __init__(self, num_degrees=None, num_channels=None, structure=None,
                 dictionary=None):
        if structure is not None:
            self.structure = list(structure)
        elif dictionary is not None:
            self.structure = [(dictionary[d], d) for d in sorted(dictionary)]
        else:
            self.structure = [(num_channels, d) for d in range(num_degrees)]
        self.multiplicities, self.degrees = zip(*self.structure)
        self.structure_dict = {d: m for m, d in self.structure}
        self.n_features = sum(m * (2 * d + 1) for m, d in self.structure)


def compute_basis(edge_vec: jax.Array, max_degree: int):
    """Per-edge equivariant kernel blocks.

    Returns dict ``{(d_in, d_out): [E, nfreq, 2*d_out+1, 2*d_in+1]}`` with
    ``nfreq = 2*min(d_in, d_out)+1`` (J = |d_in-d_out| .. d_in+d_out), from
    Y_J(edge direction) contracted with real CG tables (ref
    ``modules.py:19-49`` builds the same spans via Q_J).
    """
    Y = real_sph_harm_all(2 * max_degree, edge_vec)
    basis = {}
    for di in range(max_degree + 1):
        for do in range(max_degree + 1):
            KJ = []
            for J in range(abs(di - do), di + do + 1):
                C = jnp.asarray(
                    real_clebsch_gordan(di, J, do), jnp.float32
                )  # [2di+1, 2J+1, 2do+1]
                K = jnp.einsum("em,imo->eoi", Y[J], C)  # [E, 2do+1, 2di+1]
                KJ.append(K)
            basis[(di, do)] = jnp.stack(KJ, axis=1)  # [E, nfreq, O, I]
    return basis


class RadialFunc(fnn.Module):
    """Radial profile MLP (ref ``modules.py:192-227``): [1+edge_dim] ->
    32 (LayerNorm, act) -> 32 (LayerNorm, act) -> nfreq*mi*mo."""

    num_freq: int
    m_in: int
    m_out: int
    act: Callable = fnn.relu
    mid: int = 32

    @fnn.compact
    def __call__(self, feat):
        he = fnn.initializers.he_uniform()
        # LayerNorm eps = torch default 1e-5 (the reference's BN wraps
        # nn.LayerNorm, modules.py:370-379) — pinned by tests/test_tfn_oracle
        y = Linear(self.mid, kernel_init=he, name="lin0")(feat)
        y = self.act(fnn.LayerNorm(epsilon=1e-5, name="bn0")(y))
        y = Linear(self.mid, kernel_init=he, name="lin1")(y)
        y = self.act(fnn.LayerNorm(epsilon=1e-5, name="bn1")(y))
        y = Linear(self.num_freq * self.m_in * self.m_out, kernel_init=he,
                   name="lin2")(y)
        return y.reshape(-1, self.m_out, self.m_in, self.num_freq)


class PairwiseConv(fnn.Module):
    """Kernel for one (d_in -> d_out) pair (ref ``modules.py:230-266``)."""

    d_in: int
    m_in: int
    d_out: int
    m_out: int
    act: Callable = fnn.relu

    @fnn.compact
    def __call__(self, feat, basis):
        nfreq = 2 * min(self.d_in, self.d_out) + 1
        R = RadialFunc(nfreq, self.m_in, self.m_out, act=self.act,
                       name="rp")(feat)                    # [E, mo, mi, F]
        K = basis[(self.d_in, self.d_out)]                  # [E, F, O, I]
        # kernel[e, mo, o, mi, i] = sum_F R * K
        return jnp.einsum("emnf,efoi->emoni", R, K)


def _edge_feat(graph: GraphBatch, r: jax.Array, use_w: bool):
    if use_w and graph.edge_attr is not None and graph.edge_attr.shape[-1] > 0:
        return jnp.concatenate([graph.edge_attr, r], axis=-1)
    return r


class _ConvCore(fnn.Module):
    """Shared machinery for GConvSE3 (aggregating) and GConvSE3Partial."""

    f_in: tuple
    f_out: tuple
    self_interaction: bool = False
    edge_dim: int = 0
    act: Callable = fnn.relu
    aggregate: bool = True

    @fnn.compact
    def __call__(self, h: Dict[int, jax.Array], graph: GraphBatch,
                 r: jax.Array, basis):
        f_in, f_out = Fiber(structure=self.f_in), Fiber(structure=self.f_out)
        feat = jnp.concatenate([graph.edge_attr, r], -1) if self.edge_dim \
            else r
        dst, src, emask = graph.dst, graph.src, graph.edge_mask
        N = graph.num_nodes
        out = {}
        for mo, do in f_out.structure:
            msg = 0.0
            for mi, di in f_in.structure:
                kernel = PairwiseConv(
                    di, mi, do, mo, act=self.act, name=f"pair_{di}_{do}"
                )(feat, basis)                                  # [E,mo,O,mi,I]
                h_e = jnp.take(h[di], dst, axis=0, mode="clip")  # [E, mi, I]
                msg = msg + jnp.einsum("emoni,eni->emo", kernel, h_e)
            if self.self_interaction and do in f_in.structure_dict:
                mi = f_in.structure_dict[do]
                W = self.param(
                    f"self_{do}",
                    lambda k, s: jax.random.normal(k, s) / math.sqrt(s[-1]),
                    (mo, mi),
                )
                h_tgt = jnp.take(h[do], src, axis=0, mode="clip")
                msg = msg + jnp.einsum("mn,eni->emi", W, h_tgt)
            if self.aggregate:
                out[do] = segment_mean(msg, src, N, mask=emask)  # [N, mo, O]
            else:
                out[do] = msg
        return out


class GConvSE3(fnn.Module):
    """TFN graph convolution (ref ``modules.py:82-189``)."""

    f_in: tuple
    f_out: tuple
    self_interaction: bool = False
    edge_dim: int = 0
    act: Callable = fnn.relu

    @fnn.compact
    def __call__(self, h, graph, r, basis):
        return _ConvCore(
            self.f_in, self.f_out, self.self_interaction, self.edge_dim,
            self.act, aggregate=True, name="core",
        )(h, graph, r, basis)


class GConvSE3Partial(fnn.Module):
    """Node -> edge partial convolution (ref ``modules.py:385-467``)."""

    f_in: tuple
    f_out: tuple
    edge_dim: int = 0
    act: Callable = fnn.relu

    @fnn.compact
    def __call__(self, h, graph, r, basis):
        return _ConvCore(
            self.f_in, self.f_out, False, self.edge_dim, self.act,
            aggregate=False, name="core",
        )(h, graph, r, basis)


class GNormSE3(fnn.Module):
    """Norm nonlinearity (ref ``modules.py:302-367``)."""

    fiber: tuple
    num_layers: int = 0
    act: Callable = fnn.relu
    eps: float = 1e-12

    @fnn.compact
    def __call__(self, h: Dict[int, jax.Array]):
        out = {}
        for m, d in Fiber(structure=self.fiber).structure:
            v = h[d]
            norm = jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), self.eps
            )
            phase = v / norm
            t = norm[..., 0]  # [N, m]
            if self.num_layers == 0:
                t = self.act(fnn.LayerNorm(epsilon=1e-5, name=f"bn_{d}")(t))
            else:
                for i in range(self.num_layers):
                    t = self.act(
                        fnn.LayerNorm(epsilon=1e-5, name=f"bn_{d}_{i}")(t)
                    )
                    t = Linear(
                        m, use_bias=(i == self.num_layers - 1),
                        kernel_init=fnn.initializers.he_uniform(),
                        name=f"lin_{d}_{i}",
                    )(t)
            out[d] = t[..., None] * phase
        return out


class G1x1SE3(fnn.Module):
    """Per-degree linear mixing (ref ``modules.py:269-300``)."""

    f_in: tuple
    f_out: tuple

    @fnn.compact
    def __call__(self, h: Dict[int, jax.Array]):
        f_in = Fiber(structure=self.f_in)
        out = {}
        for mo, do in Fiber(structure=self.f_out).structure:
            mi = f_in.structure_dict[do]
            W = self.param(
                f"w_{do}",
                lambda k, s: jax.random.normal(k, s) / math.sqrt(s[-1]),
                (mo, mi),
            )
            out[do] = jnp.einsum("mn,xni->xmi", W, h[do])
        return out


def _fiber2head(h: Dict[int, jax.Array], n_heads: int, fiber: Fiber):
    """Stack degrees into [X, heads, -1] (ref ``fibers.py`` fiber2head)."""
    parts = []
    for m, d in fiber.structure:
        v = h[d]
        parts.append(v.reshape(v.shape[0], n_heads, -1))
    return jnp.concatenate(parts, axis=-1)


class GMABSE3(fnn.Module):
    """Multi-head SE(3) attention over edges (ref ``modules.py:470-552``)."""

    f_value: tuple
    f_key: tuple
    n_heads: int = 1

    @fnn.compact
    def __call__(self, v_edge, k_edge, q_node, graph: GraphBatch):
        fv = Fiber(structure=self.f_value)
        fk = Fiber(structure=self.f_key)
        src, emask, N = graph.src, graph.edge_mask, graph.num_nodes
        k = _fiber2head(k_edge, self.n_heads, fk)           # [E, H, F]
        q = _fiber2head(q_node, self.n_heads, fk)           # [N, H, F]
        e = jnp.sum(k * jnp.take(q, src, axis=0, mode="clip"), axis=-1)
        e = e / jnp.sqrt(jnp.asarray(fk.n_features, e.dtype))
        a = segment_softmax(e, src, N, mask=emask)          # [E, H]
        out = {}
        for m, d in fv.structure:
            ve = v_edge[d].reshape(-1, self.n_heads, m // self.n_heads,
                                   2 * d + 1)
            msg = a[..., None, None] * ve
            agg = segment_sum(msg, src, N, mask=emask)
            out[d] = agg.reshape(N, m, 2 * d + 1)
        return out


class GSE3Res(fnn.Module):
    """Attention block (ref ``modules.py:555-607``; skip connection is
    commented out in the reference — reproduced faithfully)."""

    f_in: tuple
    f_out: tuple
    edge_dim: int = 0
    div: float = 4
    n_heads: int = 1
    act: Callable = fnn.relu

    @fnn.compact
    def __call__(self, h, graph, r, basis):
        f_in = Fiber(structure=self.f_in)
        f_out = Fiber(structure=self.f_out)
        f_mid_out = Fiber(
            dictionary={d: int(m // self.div) for d, m in
                        f_out.structure_dict.items()}
        )
        f_mid_in = Fiber(
            dictionary={d: m for d, m in f_mid_out.structure_dict.items()
                        if d in f_in.structure_dict}
        )
        v = GConvSE3Partial(self.f_in, tuple(f_mid_out.structure),
                            edge_dim=self.edge_dim, act=self.act,
                            name="v")(h, graph, r, basis)
        k = GConvSE3Partial(self.f_in, tuple(f_mid_in.structure),
                            edge_dim=self.edge_dim, act=self.act,
                            name="k")(h, graph, r, basis)
        q = G1x1SE3(self.f_in, tuple(f_mid_in.structure), name="q")(h)
        return GMABSE3(tuple(f_mid_out.structure), tuple(f_mid_in.structure),
                       n_heads=self.n_heads, name="attn")(v, k, q, graph)
