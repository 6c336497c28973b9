from fastegnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_softmax,
    graph_mean_pool,
    graph_sum_pool,
)
from fastegnn_tpu.ops.neighbors import cutoff_edges_topk, radius_graph_np, cutoff_edges_np
from fastegnn_tpu.ops.rotation import (
    rotation_x,
    rotation_y,
    rotation_z,
    random_rotation,
    random_rotation_y,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_softmax",
    "graph_mean_pool",
    "graph_sum_pool",
    "cutoff_edges_topk",
    "radius_graph_np",
    "cutoff_edges_np",
    "rotation_x",
    "rotation_y",
    "rotation_z",
    "random_rotation",
    "random_rotation_y",
]
