"""Model zoo registry.

Mirrors the reference's CLI dispatch tables (``main_nbody.py:102-131``,
``main_protein.py``, ``main_simulation.py``) as a name -> constructor map.
``MMD_MODELS`` is the Fast* family that trains with the MMD virtual-node
auxiliary loss (``utils/train.py:111-112``).
"""

from fastegnn_tpu.models.fast_egnn import FastEGNN, EGCLVel
from fastegnn_tpu.models.fast_rf import FastRF, RFGCLVel
from fastegnn_tpu.models.vnegnn import VNEGNN
from fastegnn_tpu.models.schnet import SchNet, FastSchNet, SchNetGCL, SchNetCore
from fastegnn_tpu.models.gvp import GVPNet, GVPCell, GVPConvolution
from fastegnn_tpu.models.dimenet import (
    DimeNet,
    DimeNetPlusPlus,
    TripletDataset,
    build_triplets,
)
from fastegnn_tpu.models.eghn import EGHN, PoolingLayer, PoolingNet
from fastegnn_tpu.models.tfn import (
    FastTFN,
    OurDynamics,
    OursTFN,
    OurSE3Transformer,
    SE3Transformer,
    TFN as TFNPooled,
)
from fastegnn_tpu.models.basic import (
    EGNN,
    GNN,
    EGMN,
    FullMLP,
    LinearDynamics,
    RFVel,
    BaseMLP,
    InvariantScalarNet,
    EquivariantScalarNet,
    EquivariantEdgeScalarNet,
)

MODEL_REGISTRY = {
    "FastEGNN": FastEGNN,
    "FastRF": FastRF,
    "FastSchNet": FastSchNet,
    "FastTFN": FastTFN,
    # EGHN takes (graph, local bond edges); see models/eghn.py
    "EGHN": EGHN,
    # reference CLI name "TFN" builds the OurDynamics(model='tfn') wrapper
    # (main_nbody.py:117-120)
    "TFN": OurDynamics,
    "VNEGNN": VNEGNN,
    "EGNN": EGNN,
    "GNN": GNN,
    "Linear": LinearDynamics,
    "RF": RFVel,
    "MLP": FullMLP,
    "SchNet": SchNet,
    "GVP": GVPNet,
    # NOTE: DimeNet/DimeNet++ take (graph, triplets); wrap the dataset with
    # TripletDataset and drive them with a custom step (see models/dimenet.py)
    "DimeNet": DimeNet,
    "DimeNet++": DimeNetPlusPlus,
}

# Models whose training loss includes the MMD virtual-node term
# (utils/train.py:111-112).
MMD_MODELS = {"FastEGNN", "FastRF", "FastTFN", "FastSchNet"}

# Constructor kwargs each model accepts (the CLI filters its arg set by this).
_GEOMETRIC_KW = {"hidden", "n_layers", "attention", "normalize", "tanh"}
MODEL_KWARGS = {
    "FastEGNN": _GEOMETRIC_KW | {"virtual_channels", "gravity",
                                 "compute_dtype"},
    "FastRF": _GEOMETRIC_KW | {"virtual_channels", "gravity"},
    "FastSchNet": _GEOMETRIC_KW | {"virtual_channels", "gravity"},
    "FastTFN": _GEOMETRIC_KW | {"virtual_channels", "gravity"},
    "TFN": {"nf", "n_layers", "num_degrees", "div"},
    "EGHN": {"hidden", "n_cluster", "layer_per_block", "layer_pooling", "layer_decoder"},
    "VNEGNN": _GEOMETRIC_KW | {"virtual_channels"},
    "EGNN": {"hidden", "n_layers"},
    "GNN": {"hidden", "n_layers"},
    "Linear": set(),
    "RF": {"hidden", "n_layers"},
    "MLP": {"hidden", "n_layers"},
    # reference CLI fixes SchNet to 16 interactions regardless of --num_layer
    # (main_nbody.py:129)
    "SchNet": {"hidden", "num_interactions", "num_filters", "num_gaussians", "cutoff"},
    "GVP": {"n_layers", "node_h_dim", "edge_h_dim", "drop_rate"},
    # reference builds: main_nbody.py:124-127 (bilinear 8, spherical 7,
    # radial 6, cutoff 10; num_blocks = --num_layer)
    "DimeNet": {"hidden", "num_blocks"},
    "DimeNet++": {"hidden", "num_blocks"},
}


def get_model(name: str, **kwargs):
    try:
        cls = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    allowed = MODEL_KWARGS.get(name)
    if allowed is not None:
        kwargs = {k: v for k, v in kwargs.items() if k in allowed}
    return cls(**kwargs)


__all__ = [
    "FastEGNN",
    "EGCLVel",
    "FastRF",
    "RFGCLVel",
    "VNEGNN",
    "EGNN",
    "GNN",
    "EGMN",
    "FullMLP",
    "LinearDynamics",
    "RFVel",
    "BaseMLP",
    "InvariantScalarNet",
    "EquivariantScalarNet",
    "EquivariantEdgeScalarNet",
    "MODEL_REGISTRY",
    "MMD_MODELS",
    "MODEL_KWARGS",
    "get_model",
]
