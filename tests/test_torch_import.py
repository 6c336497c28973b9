"""Reference state-dict import parity.

A pure-numpy, torch-layout re-implementation of the reference FastEGNN
forward (``models/FastEGNN.py:192-276`` math, weights as ``[out, in]``)
serves as the oracle: importing a (synthetic) reference ``state_dict`` into
our model must reproduce its outputs to the reference's own equivariance
tolerance (1e-4).  This is the BASELINE.md per-layer-activation criterion,
executable without torch_geometric.
"""

import numpy as np
import jax
import pytest

from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.utils.torch_import import params_from_reference_state_dict

from helpers import random_raw_graph


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _lin(sd, p, x):
    return x @ np.asarray(sd[f"{p}.weight"]).T + np.asarray(sd[f"{p}.bias"])


def _lin_nb(sd, p, x):
    return x @ np.asarray(sd[f"{p}.weight"]).T


def _mlp2(sd, p, x, act_final):
    y = _silu(_lin(sd, f"{p}.0", x))
    y = _lin(sd, f"{p}.2", y)
    return _silu(y) if act_final else y


def _coord_mlp(sd, p, x):
    return _lin_nb(sd, f"{p}.2", _silu(_lin(sd, f"{p}.0", x)))


def make_state_dict(rng, H, C, n_layers, Fe=2, nf=2):
    sd = {}
    sd["embedding_in.weight"] = rng.normal(size=(H, nf)).astype(np.float32) * 0.3
    sd["embedding_in.bias"] = rng.normal(size=H).astype(np.float32) * 0.1
    sd["virtual_node_feat"] = rng.normal(size=(1, H, C)).astype(np.float32)

    def lin(p, o, i, bias=True, scale=0.3):
        sd[f"{p}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * scale
        if bias:
            sd[f"{p}.bias"] = rng.normal(size=o).astype(np.float32) * 0.1

    for l in range(n_layers):
        g = f"gcl_{l}"
        lin(f"{g}.edge_mlp.0", H, 2 * H + 1 + Fe)
        lin(f"{g}.edge_mlp.2", H, H)
        lin(f"{g}.edge_mlp_virtual.0", H, 2 * H + 1 + C)
        lin(f"{g}.edge_mlp_virtual.2", H, H)
        for p in ["coord_mlp_r", "coord_mlp_r_virtual", "coord_mlp_v_virtual"]:
            lin(f"{g}.{p}.0", H, H)
            lin(f"{g}.{p}.2", 1, H, bias=False, scale=0.01)
        lin(f"{g}.coord_mlp_vel.0", H, H)
        lin(f"{g}.coord_mlp_vel.2", 1, H)
        lin(f"{g}.node_mlp.0", H, 2 * H + C * H)
        lin(f"{g}.node_mlp.2", H, H)
        lin(f"{g}.node_mlp_virtual.0", H, 2 * H)
        lin(f"{g}.node_mlp_virtual.2", H, H)
    return sd


def reference_forward_np(sd, node_feat, loc, vel, row, col, batch_ids,
                         loc_mean, edge_attr, H, C, n_layers):
    """Literal numpy transcription of models/FastEGNN.py:192-276."""
    B = batch_ids.max() + 1
    N = loc.shape[0]

    def seg_mean(data, ids, n):
        out = np.zeros((n,) + data.shape[1:], np.float32)
        cnt = np.zeros(n, np.float32)
        for k, i in enumerate(ids):
            out[i] += data[k]
            cnt[i] += 1
        return out / np.maximum(cnt, 1.0).reshape(-1, *([1] * (data.ndim - 1)))

    h = node_feat @ np.asarray(sd["embedding_in.weight"]).T + sd["embedding_in.bias"]
    x = loc.copy()
    X = loc_mean.copy()                       # [B, 3, C]
    Hv = np.repeat(np.asarray(sd["virtual_node_feat"]), B, axis=0)  # [B, H, C]

    for l in range(n_layers):
        g = f"gcl_{l}"
        coord_diff = x[row] - x[col]
        radial = np.sum(coord_diff**2, axis=1, keepdims=True)
        vdiff = X[batch_ids] - x[:, :, None]            # [N, 3, C]
        vrad = np.linalg.norm(vdiff, axis=1, keepdims=True)  # [N, 1, C]

        e_in = np.concatenate([h[row], h[col], radial, edge_attr], axis=1)
        edge_feat = _mlp2(sd, f"{g}.edge_mlp", e_in, act_final=True)

        coord_mean = seg_mean(x, batch_ids, B)          # [B, 3]
        m_X = X - coord_mean[:, :, None]
        gram = np.einsum("bij,bjk->bik", np.transpose(m_X, (0, 2, 1)), m_X)

        ev_in = np.concatenate(
            [np.repeat(h[:, :, None], C, axis=2), Hv[batch_ids], vrad,
             gram[batch_ids]],
            axis=1,
        )  # [N, 2H+1+C, C]
        ev_in_t = np.transpose(ev_in, (0, 2, 1))        # [N, C, 2H+1+C]
        mv = _silu(_lin(sd, f"{g}.edge_mlp_virtual.0", ev_in_t))
        mv = _silu(_lin(sd, f"{g}.edge_mlp_virtual.2", mv))  # [N, C, H]
        mv_hc = np.transpose(mv, (0, 2, 1))             # [N, H, C]

        trans = coord_diff * _coord_mlp(sd, f"{g}.coord_mlp_r", edge_feat)
        x = x + seg_mean(trans, row, N)
        gate_xv = _coord_mlp(sd, f"{g}.coord_mlp_r_virtual", mv)  # [N, C, 1]
        x = x + np.mean(-vdiff * np.transpose(gate_xv, (0, 2, 1)), axis=2)
        x = x + _mlp2(sd, f"{g}.coord_mlp_vel", h, act_final=False) * vel

        gate_X = _coord_mlp(sd, f"{g}.coord_mlp_v_virtual", mv)  # [N, C, 1]
        tr = vdiff * np.transpose(gate_X, (0, 2, 1))    # [N, 3, C]
        X = X + seg_mean(tr, batch_ids, B)

        agg_e = seg_mean(edge_feat, row, N)
        h_in = np.concatenate(
            [h, agg_e, mv_hc.reshape(N, -1)], axis=1    # [H, C]-flatten (ref)
        )
        h = h + _mlp2(sd, f"{g}.node_mlp", h_in, act_final=False)

        pool = seg_mean(mv_hc, batch_ids, B)            # [B, H, C]
        hv_in = np.concatenate([Hv, pool], axis=1)      # [B, 2H, C]
        hv_t = np.transpose(hv_in, (0, 2, 1))
        dv = _silu(_lin(sd, f"{g}.node_mlp_virtual.0", hv_t))
        dv = _lin(sd, f"{g}.node_mlp_virtual.2", dv)
        Hv = Hv + np.transpose(dv, (0, 2, 1))

    return x, X


def test_reference_import_parity():
    H, C, L = 16, 3, 2
    rng = np.random.default_rng(0)
    sd = make_state_dict(rng, H, C, L)

    raws = [random_raw_graph(rng, 6) for _ in range(2)]
    e = raws[0]["dst"].shape[0]
    spec = GraphSpec(max_nodes=6, max_edges=e, n_graphs=2, edge_attr_dim=2)
    # no padding, no pallas: the cleanest parity surface
    batch = batch_graphs([pad_graph(spec, **r) for r in raws], spec,
                         build_csr=False, edge_align=1)

    params = params_from_reference_state_dict(sd, n_layers=L, hidden=H,
                                              virtual_channels=C)
    model = FastEGNN(hidden=H, virtual_channels=C, n_layers=L)
    x_ours, vx_ours = model.apply({"params": params}, batch)

    # reference oracle on the identical (unpadded) batch
    x_ref, X_ref = reference_forward_np(
        sd,
        np.asarray(batch.node_feat),
        np.asarray(batch.coord),
        np.asarray(batch.vel),
        np.asarray(batch.dst),
        np.asarray(batch.src),
        np.asarray(batch.graph_id),
        np.asarray(batch.loc_mean),
        np.asarray(batch.edge_attr),
        H, C, L,
    )
    np.testing.assert_allclose(np.asarray(x_ours), x_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vx_ours), X_ref, atol=1e-4, rtol=1e-4)


def test_import_tree_matches_init():
    """Imported params must match the model's own init tree exactly."""
    H, C, L = 16, 3, 2
    rng = np.random.default_rng(1)
    sd = make_state_dict(rng, H, C, L)
    params = params_from_reference_state_dict(sd, n_layers=L, hidden=H,
                                              virtual_channels=C)

    raws = [random_raw_graph(rng, 5)]
    e = raws[0]["dst"].shape[0]
    spec = GraphSpec(max_nodes=5, max_edges=e, n_graphs=1, edge_attr_dim=2)
    batch = batch_graphs([pad_graph(spec, **r) for r in raws], spec)
    model = FastEGNN(hidden=H, virtual_channels=C, n_layers=L)
    init_params = model.init(jax.random.key(0), batch)["params"]

    init_shapes = jax.tree.map(lambda a: a.shape, init_params)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert init_shapes == got_shapes
