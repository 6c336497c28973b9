"""fastegnn_tpu — a TPU-native equivariant graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
GLAD-RUC/FastEGNN reference (ICML'24 "Improving Equivariant Graph Neural
Networks on Large Geometric Graphs via Virtual Nodes Learning"):

- E(3)-equivariant message passing model zoo centered on FastEGNN
  (virtual global node channels), expressed as static-shape masked
  segment ops that XLA can fuse and tile onto the MXU.
- Padded/bucketed ``GraphBatch`` batching instead of dynamic edge lists.
- A training engine (optax + orbax) with the reference's MMD virtual-node
  auxiliary loss, early stopping, and JSON logging.
- Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map``: data
  parallelism over graphs and edge/node-sharded single-graph parallelism.

Nothing here is a port: the reference (PyTorch + torch_scatter/PyG/DGL)
defines *what* is computed; the implementation is TPU-first.
"""

from fastegnn_tpu.graph import GraphBatch, GraphSpec, pad_graph, batch_graphs

__version__ = "0.1.0"

__all__ = [
    "GraphBatch",
    "GraphSpec",
    "pad_graph",
    "batch_graphs",
]
