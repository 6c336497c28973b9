from fastegnn_tpu.data.batcher import GraphDataset
from fastegnn_tpu.data.nbody import NBodyDataset

__all__ = ["GraphDataset", "NBodyDataset"]
