from fastegnn_tpu.models.tfn.so3 import (
    clebsch_gordan,
    real_clebsch_gordan,
    real_sph_harm_all,
)
from fastegnn_tpu.models.tfn.layers import (
    Fiber,
    GConvSE3,
    GNormSE3,
    G1x1SE3,
    GConvSE3Partial,
    GMABSE3,
    GSE3Res,
    compute_basis,
)
from fastegnn_tpu.models.tfn.models import (
    TFN,
    OursTFN,
    SE3Transformer,
    OurSE3Transformer,
    OurDynamics,
)
from fastegnn_tpu.models.tfn.fast_tfn import FastTFN

__all__ = [
    "clebsch_gordan", "real_clebsch_gordan", "real_sph_harm_all",
    "Fiber", "GConvSE3", "GNormSE3", "G1x1SE3", "GConvSE3Partial",
    "GMABSE3", "GSE3Res", "compute_basis",
    "TFN", "OursTFN", "SE3Transformer", "OurSE3Transformer", "OurDynamics",
    "FastTFN",
]
