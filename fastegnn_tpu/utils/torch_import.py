"""Import reference PyTorch FastEGNN ``state_dict`` weights into our params.

The parity criterion (BASELINE.md): load the reference checkpoint, map
parameters, and match per-layer activations.  Key layout of the reference
(``models/FastEGNN.py``):

    embedding_in.weight/bias
    virtual_node_feat                      [1, H, C]
    gcl_{i}.edge_mlp.{0,2}.weight/bias     Linear(2H+1+Fe -> H), Linear(H -> H)
    gcl_{i}.edge_mlp_virtual.{0,2}...      Linear(2H+1+C -> H), Linear(H -> H)
    gcl_{i}.coord_mlp_r.{0}.w/b, {2}.w     Linear(H->H), Linear(H->1, no bias)
    gcl_{i}.coord_mlp_r_virtual.{0,2}      same
    gcl_{i}.coord_mlp_v_virtual.{0,2}      same
    gcl_{i}.coord_mlp_vel.{0,2}.w/b        Linear(H->H), Linear(H->1)
    gcl_{i}.gravity_mlp.{0,2}.w/b          (when gravity set)
    gcl_{i}.node_mlp.{0,2}.w/b             Linear(2H + C*H (+attr) -> H), ...
    gcl_{i}.node_mlp_virtual.{0,2}.w/b     Linear(2H -> H), Linear(H -> H)

Layout conversions:
- torch Linear stores ``weight [out, in]``; flax kernels are ``[in, out]``.
- our virtual tensors are channel-major: ``virtual_node_feat`` transposes
  [1, H, C] -> [1, C, H].
- the node MLP's flattened virtual-message block is [H, C]-ordered in the
  reference (``models/FastEGNN.py:157``) but [C, H]-ordered here — the
  corresponding *input columns* of ``node_mlp.0.weight`` are permuted.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _linear(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def params_from_reference_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_layers: int = 4,
    hidden: int = 64,
    virtual_channels: int = 3,
    has_gravity: bool = False,
    attention: bool = False,
) -> dict:
    """Build a flax params dict for :class:`~fastegnn_tpu.models.FastEGNN`."""
    sd = state_dict
    H, C = hidden, virtual_channels

    params: dict = {
        "embedding_in": _linear(sd, "embedding_in"),
        # [1, H, C] -> [1, C, H]
        "virtual_node_feat": np.transpose(
            _np(sd["virtual_node_feat"]), (0, 2, 1)
        ),
    }

    # input-column permutation for node_mlp.0: virtual block [H, C]-flat ->
    # [C, H]-flat (reference models/FastEGNN.py:157 vs our layer docstring)
    def permute_node_mlp_kernel(K):
        # K: [in, out]; in = H + H + C*H (+ attr, which the reference never
        # uses for FastEGNN)
        base = 2 * H
        virt = K[base : base + C * H]
        # reference row order: (h_idx, c) flattened h-major ->
        # ours: (c, h_idx) flattened c-major
        virt = virt.reshape(H, C, -1).transpose(1, 0, 2).reshape(C * H, -1)
        return np.concatenate([K[:base], virt, K[base + C * H :]], axis=0)

    for i in range(n_layers):
        g = f"gcl_{i}"
        node0 = _linear(sd, f"{g}.node_mlp.0")
        node0["kernel"] = permute_node_mlp_kernel(node0["kernel"])
        layer = {
            "edge_mlp_lin0": _linear(sd, f"{g}.edge_mlp.0"),
            "edge_mlp_lin1": _linear(sd, f"{g}.edge_mlp.2"),
            "edge_mlp_virtual": {
                "lin0": _linear(sd, f"{g}.edge_mlp_virtual.0"),
                "lin1": _linear(sd, f"{g}.edge_mlp_virtual.2"),
            },
            "coord_mlp_r_lin0": _linear(sd, f"{g}.coord_mlp_r.0"),
            "coord_mlp_r_head": _linear(sd, f"{g}.coord_mlp_r.2", bias=False),
            "coord_mlp_r_virtual": {
                "lin0": _linear(sd, f"{g}.coord_mlp_r_virtual.0"),
                "head": _linear(sd, f"{g}.coord_mlp_r_virtual.2", bias=False),
            },
            "coord_mlp_v_virtual": {
                "lin0": _linear(sd, f"{g}.coord_mlp_v_virtual.0"),
                "head": _linear(sd, f"{g}.coord_mlp_v_virtual.2", bias=False),
            },
            "coord_mlp_vel": {
                "lin0": _linear(sd, f"{g}.coord_mlp_vel.0"),
                "lin1": _linear(sd, f"{g}.coord_mlp_vel.2"),
            },
            "node_mlp": {
                "lin0": node0,
                "lin1": _linear(sd, f"{g}.node_mlp.2"),
            },
            "node_mlp_virtual": {
                "lin0": _linear(sd, f"{g}.node_mlp_virtual.0"),
                "lin1": _linear(sd, f"{g}.node_mlp_virtual.2"),
            },
        }
        if has_gravity:
            layer["gravity_mlp"] = {
                "lin0": _linear(sd, f"{g}.gravity_mlp.0"),
                "lin1": _linear(sd, f"{g}.gravity_mlp.2"),
            }
        if attention:
            # reference att nets are Sequential(Linear(H,1), Sigmoid)
            # (models/FastEGNN.py:44-50); ours apply the sigmoid inline
            layer["att_mlp"] = _linear(sd, f"{g}.att_mlp.0")
            layer["att_mlp_virtual"] = _linear(sd, f"{g}.att_mlp_virtual.0")
        params[g] = layer

    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def _mlp2(sd, prefix):
    """Reference ``nn.Sequential(Linear, act, Linear)`` -> our MLP params."""
    return {"lin0": _linear(sd, f"{prefix}.0"), "lin1": _linear(sd, f"{prefix}.2")}


def _coord_mlp(sd, prefix):
    """Reference ``get_coord_mlp`` (Linear, act, Linear(H->1, no bias))."""
    return {
        "lin0": _linear(sd, f"{prefix}.0"),
        "head": _linear(sd, f"{prefix}.2", bias=False),
    }


def params_from_fastrf_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_layers: int = 4,
    has_gravity: bool = False,
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.FastRF` from the reference
    ``models/FastRF.py`` state dict (module names ``FastRF.py:28-86``)."""
    sd = state_dict
    params: dict = {
        "embedding_in": _linear(sd, "embedding_in"),
        "virtual_node_feat": np.transpose(_np(sd["virtual_node_feat"]), (0, 2, 1)),
    }
    for i in range(n_layers):
        g = f"gcl_{i}"
        layer = {
            "edge_mlp": _mlp2(sd, f"{g}.edge_mlp"),
            "edge_mlp_virtual": _mlp2(sd, f"{g}.edge_mlp_virtual"),
            "coord_mlp_r": _coord_mlp(sd, f"{g}.coord_mlp_r"),
            "coord_mlp_r_virtual": _coord_mlp(sd, f"{g}.coord_mlp_r_virtual"),
            "coord_mlp_v_virtual": _coord_mlp(sd, f"{g}.coord_mlp_v_virtual"),
            "coord_mlp_vel": _mlp2(sd, f"{g}.coord_mlp_vel"),
        }
        if has_gravity:
            layer["gravity_mlp"] = _mlp2(sd, f"{g}.gravity_mlp")
        params[g] = layer
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_fastschnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_layers: int = 4,
    hidden: int = 64,
    virtual_channels: int = 3,
    has_gravity: bool = False,
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.FastSchNet` from the
    reference ``models/FastSchNet.py`` state dict.

    The embedded 1-interaction SchNet maps ``SchNetLayer.interactions.0.*``
    -> our ``schnet_layer/interaction_0`` (CFConv filter MLP ``conv.nn.{0,2}``
    -> ``conv/nn{0,1}``); its unused output head (``lin1``/``lin2``,
    ``FastSchNet.py:431-434``) and the unused ``coord_mlp_r``/``coord_mlp_vel``
    (``FastSchNet.py:137-145``) are dropped.  ``node_mlp.0`` input columns for
    the flattened virtual message permute [H,C]->[C,H] as in FastEGNN.
    """
    sd = state_dict
    H, C = hidden, virtual_channels

    def permute_node_mlp_kernel(K):
        base = 2 * H
        virt = K[base : base + C * H]
        virt = virt.reshape(H, C, -1).transpose(1, 0, 2).reshape(C * H, -1)
        return np.concatenate([K[:base], virt, K[base + C * H :]], axis=0)

    params: dict = {
        "embedding_in": _linear(sd, "embedding_in"),
        "virtual_node_feat": np.transpose(_np(sd["virtual_node_feat"]), (0, 2, 1)),
    }
    for i in range(n_layers):
        g = f"gcl_{i}"
        node0 = _linear(sd, f"{g}.node_mlp.0")
        node0["kernel"] = permute_node_mlp_kernel(node0["kernel"])
        s = f"{g}.SchNetLayer"
        layer = {
            "edge_mlp": _mlp2(sd, f"{g}.edge_mlp"),
            "edge_mlp_virtual": _mlp2(sd, f"{g}.edge_mlp_virtual"),
            "coord_mlp_r_virtual": _coord_mlp(sd, f"{g}.coord_mlp_r_virtual"),
            "coord_mlp_v_virtual": _coord_mlp(sd, f"{g}.coord_mlp_v_virtual"),
            "node_mlp": {"lin0": node0, "lin1": _linear(sd, f"{g}.node_mlp.2")},
            "node_mlp_virtual": _mlp2(sd, f"{g}.node_mlp_virtual"),
            "schnet_layer": {
                "coord_update_0": _linear(sd, f"{s}.coord_updates.0"),
                "interaction_0": {
                    "conv": {
                        "nn0": _linear(sd, f"{s}.interactions.0.conv.nn.0"),
                        "nn1": _linear(sd, f"{s}.interactions.0.conv.nn.2"),
                        "lin1": _linear(
                            sd, f"{s}.interactions.0.conv.lin1", bias=False
                        ),
                        "lin2": _linear(sd, f"{s}.interactions.0.conv.lin2"),
                    },
                    "lin": _linear(sd, f"{s}.interactions.0.lin"),
                },
            },
        }
        if has_gravity:
            layer["gravity_mlp"] = _mlp2(sd, f"{g}.gravity_mlp")
        params[g] = layer
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def _interaction(sd, prefix):
    """Reference SchNet ``InteractionBlock`` (``models/SchNet.py:198-249``):
    CFConv filter net ``conv.nn.{0,2}``, ``conv.lin1`` (no bias),
    ``conv.lin2``, output ``lin``."""
    return {
        "conv": {
            "nn0": _linear(sd, f"{prefix}.conv.nn.0"),
            "nn1": _linear(sd, f"{prefix}.conv.nn.2"),
            "lin1": _linear(sd, f"{prefix}.conv.lin1", bias=False),
            "lin2": _linear(sd, f"{prefix}.conv.lin2"),
        },
        "lin": _linear(sd, f"{prefix}.lin"),
    }


def params_from_schnet_state_dict(
    state_dict: Dict[str, "np.ndarray"], num_interactions: int = 16
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.SchNet` from the
    reference ``models/SchNet.py`` state dict (``SchNet.py:119,127-141``);
    the unused ``lin1``/``lin2`` output head is dropped."""
    sd = state_dict
    params: dict = {"embedding": _linear(sd, "embedding")}
    for i in range(num_interactions):
        params[f"interaction_{i}"] = _interaction(sd, f"interactions.{i}")
        params[f"coord_update_{i}"] = _linear(sd, f"coord_updates.{i}")
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_dimenet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    num_blocks: int = 4,
    plusplus: bool = False,
    num_output_layers: int = 3,
    num_before_skip: int = 1,
    num_after_skip: int = 2,
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.DimeNet` (/++) from the
    reference ``models/DimeNet.py`` state dict (``DimeNet.py:443-718``)."""
    sd = state_dict

    def res(prefix):
        return {"lin1": _linear(sd, f"{prefix}.lin1"),
                "lin2": _linear(sd, f"{prefix}.lin2")}

    def output_block(prefix):
        out = {"lin_rbf": _linear(sd, f"{prefix}.lin_rbf", bias=False),
               "lin_out": _linear(sd, f"{prefix}.lin", bias=False)}
        if plusplus:
            out["lin_up"] = _linear(sd, f"{prefix}.lin_up", bias=False)
        for i in range(num_output_layers):
            out[f"lin_{i}"] = _linear(sd, f"{prefix}.lins.{i}")
        return out

    def interaction_block(prefix):
        out = {
            "lin_ji": _linear(sd, f"{prefix}.lin_ji"),
            "lin_kj": _linear(sd, f"{prefix}.lin_kj"),
            "lin": _linear(sd, f"{prefix}.lin"),
        }
        if plusplus:
            out.update(
                lin_rbf1=_linear(sd, f"{prefix}.lin_rbf1", bias=False),
                lin_rbf2=_linear(sd, f"{prefix}.lin_rbf2", bias=False),
                lin_sbf1=_linear(sd, f"{prefix}.lin_sbf1", bias=False),
                lin_sbf2=_linear(sd, f"{prefix}.lin_sbf2", bias=False),
                lin_down=_linear(sd, f"{prefix}.lin_down", bias=False),
                lin_up=_linear(sd, f"{prefix}.lin_up", bias=False),
            )
        else:
            out.update(
                lin_rbf=_linear(sd, f"{prefix}.lin_rbf", bias=False),
                lin_sbf=_linear(sd, f"{prefix}.lin_sbf", bias=False),
                W=_np(sd[f"{prefix}.W"]),
            )
        for i in range(num_before_skip):
            out[f"res_before_{i}"] = res(f"{prefix}.layers_before_skip.{i}")
        # ++ reference bug: after-skip stack sized by num_BEFORE_skip
        n_after = num_before_skip if plusplus else num_after_skip
        for i in range(n_after):
            out[f"res_after_{i}"] = res(f"{prefix}.layers_after_skip.{i}")
        return out

    params: dict = {
        "bessel_freq": _np(sd["rbf.freq"]),
        "emb": _linear(sd, "emb.emb"),
        "emb_lin_rbf": _linear(sd, "emb.lin_rbf"),
        "emb_lin": _linear(sd, "emb.lin"),
        "output_0": output_block("output_blocks.0"),
    }
    for b in range(num_blocks):
        params[f"interaction_{b}"] = interaction_block(
            f"interaction_blocks.{b}")
        params[f"output_{b + 1}"] = output_block(f"output_blocks.{b + 1}")
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def _gvp_cell(sd, prefix):
    """Reference ``GVP`` cell (``models/GVP.py:89-153``): wh (no bias), ws,
    optional wv (no bias) / wsv (vector gate)."""
    out = {"ws": _linear(sd, f"{prefix}.ws")}
    if f"{prefix}.wh.weight" in sd:
        out["wh"] = _linear(sd, f"{prefix}.wh", bias=False)
    if f"{prefix}.wv.weight" in sd:
        out["wv"] = _linear(sd, f"{prefix}.wv", bias=False)
    if f"{prefix}.wsv.weight" in sd:
        out["wsv"] = _linear(sd, f"{prefix}.wsv")
    return out


def _tuple_ln(sd, prefix):
    """Reference tuple ``LayerNorm`` (``GVP.py:199-220``): parameters only on
    the scalar channel."""
    return {
        "scalar_norm": {
            "scale": _np(sd[f"{prefix}.scalar_norm.weight"]),
            "bias": _np(sd[f"{prefix}.scalar_norm.bias"]),
        }
    }


def params_from_gvpnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_layers: int = 4,
    n_message: int = 3,
    n_feedforward: int = 2,
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.GVPNet` from the
    reference ``models/GVP.py`` GVPNet state dict (``GVP.py:388-456``);
    the dead ``dense`` head (never called in ``forward``) is dropped."""
    sd = state_dict
    params: dict = {
        "wv_norm": _tuple_ln(sd, "W_v.0"),
        "wv_gvp": _gvp_cell(sd, "W_v.1"),
        "we_norm": _tuple_ln(sd, "W_e.0"),
        "we_gvp": _gvp_cell(sd, "W_e.1"),
        "out_norm": _tuple_ln(sd, "W_out.0"),
        "out_gvp": _gvp_cell(sd, "W_out.1"),
    }
    for i in range(n_layers):
        p = f"layers.{i}"
        layer = {
            "conv": {
                f"message{j}": _gvp_cell(sd, f"{p}.conv.message_func.{j}")
                for j in range(n_message)
            },
            "norm0": _tuple_ln(sd, f"{p}.norm.0"),
            "norm1": _tuple_ln(sd, f"{p}.norm.1"),
        }
        for j in range(n_feedforward):
            layer[f"ff{j}"] = _gvp_cell(sd, f"{p}.ff_func.{j}")
        params[f"layer_{i}"] = layer
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def _base_mlp(sd, prefix):
    """Reference ``BaseMLP`` (``basic.py:178-196``, keys ``mlp.0``/``mlp.2``)."""
    return {"lin0": _linear(sd, f"{prefix}.mlp.0"), "lin1": _linear(sd, f"{prefix}.mlp.2")}


def _egnn_params(sd, prefix: str, n_layers: int, with_v: bool) -> dict:
    """EGNN params under a state-dict ``prefix`` ('' for top-level EGNN;
    'low_force_net.' / 'high_force_net.' inside EGHN, ``basic.py:586-593``)."""
    params: dict = {"embedding": _linear(sd, f"{prefix}embedding")}
    for i in range(n_layers):
        p = f"{prefix}layers.{i}"
        layer = {
            "edge_message_net": {
                "scalar_net": _base_mlp(sd, f"{p}.edge_message_net.scalar_net")
            },
            "coord_net": _base_mlp(sd, f"{p}.coord_net"),
            "node_net": _base_mlp(sd, f"{p}.node_net"),
        }
        if with_v:
            layer["node_v_net"] = _base_mlp(sd, f"{p}.node_v_net")
        params[f"layer_{i}"] = layer
    return params


def params_from_egnn_state_dict(
    state_dict: Dict[str, "np.ndarray"], n_layers: int = 4, with_v: bool = True
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.EGNN` from the reference
    ``models/basic.py`` EGNN state dict (``basic.py:285-341``)."""
    params = _egnn_params(state_dict, "", n_layers, with_v)
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_eghn_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    layer_per_block: int = 3,
    layer_pooling: int = 4,
    layer_decoder: int = 2,
    with_v: bool = True,
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.EGHN` from the reference
    ``EGHN`` state dict (``basic.py:571-736``; protein config
    ``main_protein.py:133``): embedding + low/high EGNN force nets +
    PoolingNet (``basic.py:546-568``) + EGMN/EquivariantScalarNet decoder."""
    sd = state_dict
    pooling = {
        "pool0": _linear(sd, "low_pooling.pooling.0"),
        "pool1": _linear(sd, "low_pooling.pooling.2"),
    }
    for i in range(layer_pooling):
        p = f"low_pooling.layers.{i}"
        pooling[f"layer_{i}"] = {
            "edge_message_net": {
                "in_scalar_net": _base_mlp(sd, f"{p}.edge_message_net.in_scalar_net"),
                "out_vector_net": _base_mlp(sd, f"{p}.edge_message_net.out_vector_net"),
            },
            "node_net": _base_mlp(sd, f"{p}.node_net"),
        }
    if layer_decoder == 1:
        kin = {
            "in_scalar_net": _base_mlp(sd, "kinematics_net.in_scalar_net"),
            "out_vector_net": _base_mlp(sd, "kinematics_net.out_vector_net"),
            "out_scalar_net": _base_mlp(sd, "kinematics_net.out_scalar_net"),
        }
    else:
        kin = {
            f"layer_{i}": {
                "in_scalar_net": _base_mlp(sd, f"kinematics_net.layers.{i}.in_scalar_net"),
                "out_vector_net": _base_mlp(sd, f"kinematics_net.layers.{i}.out_vector_net"),
                "out_scalar_net": _base_mlp(sd, f"kinematics_net.layers.{i}.out_scalar_net"),
            }
            for i in range(layer_decoder)
        }
    params = {
        "embedding": _linear(sd, "embedding"),
        "low_force_net": _egnn_params(sd, "low_force_net.", layer_per_block, with_v),
        "high_force_net": _egnn_params(sd, "high_force_net.", layer_per_block, with_v),
        "low_pooling": pooling,
        "kinematics_net": kin,
    }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_gnn_state_dict(
    state_dict: Dict[str, "np.ndarray"], n_layers: int = 4
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.GNN` from the reference
    ``models/basic.py`` GNN state dict (``basic.py:382-404``)."""
    sd = state_dict
    params: dict = {
        "embedding": _linear(sd, "embedding"),
        "dec0": _linear(sd, "decoder.0"),
        "dec1": _linear(sd, "decoder.2"),
    }
    for i in range(n_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "edge_message_net": _base_mlp(sd, f"{p}.edge_message_net"),
            "node_net": _base_mlp(sd, f"{p}.node_net"),
        }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_rfvel_state_dict(
    state_dict: Dict[str, "np.ndarray"], n_layers: int = 4
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.RFVel` from the reference
    ``RF_vel`` state dict (``basic.py:418-447``: per-cell ``phi`` Sequential
    and ``coord_mlp_vel``)."""
    sd = state_dict
    params: dict = {}
    for i in range(n_layers):
        g = f"gcl_{i}"
        params[g] = {
            "phi0": _linear(sd, f"{g}.phi.0"),
            "phi1": _linear(sd, f"{g}.phi.2", bias=False),
            "vel0": _linear(sd, f"{g}.coord_mlp_vel.0"),
            "vel1": _linear(sd, f"{g}.coord_mlp_vel.2"),
        }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_linear_dynamics_state_dict(
    state_dict: Dict[str, "np.ndarray"],
) -> dict:
    """``Linear_dynamics`` (``basic.py:407-415``): a single scalar ``time``."""
    return {"time": _np(state_dict["time"])}


def params_from_egmn_state_dict(
    state_dict: Dict[str, "np.ndarray"], n_layers: int = 4
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.EGMN` from the reference
    ``EGMN`` state dict (``basic.py:344-361``: stacked EquivariantScalarNets
    with in_scalar/out_vector/out_scalar BaseMLPs)."""
    sd = state_dict
    params: dict = {}
    for i in range(n_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "in_scalar_net": _base_mlp(sd, f"{p}.in_scalar_net"),
            "out_vector_net": _base_mlp(sd, f"{p}.out_vector_net"),
            "out_scalar_net": _base_mlp(sd, f"{p}.out_scalar_net"),
        }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def params_from_vnegnn_state_dict(
    state_dict: Dict[str, "np.ndarray"], n_layers: int = 4
) -> dict:
    """Flax params for :class:`~fastegnn_tpu.models.VNEGNN` from the reference
    ``models/VNEGNN.py`` state dict (sub-cells ``VNEGNN.py:337-342``)."""
    sd = state_dict
    params: dict = {
        "embedding_in": _linear(sd, "embedding_in"),
        "virtual_node_feat": np.transpose(_np(sd["virtual_node_feat"]), (0, 2, 1)),
    }
    for i in range(n_layers):
        for cell in ("A2A", "A2V", "V2A"):
            g = f"{cell}_{i}"
            params[g] = {
                "edge_mlp": _mlp2(sd, f"{g}.edge_mlp"),
                "node_mlp": _mlp2(sd, f"{g}.node_mlp"),
                "coord_mlp": _coord_mlp(sd, f"{g}.coord_mlp"),
            }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)
