from fastegnn_tpu.parallel.mesh import make_mesh
from fastegnn_tpu.parallel.data_parallel import (
    stack_shards,
    shard_batch_for_mesh,
    make_dp_train_step,
    make_dp_eval_step,
)
from fastegnn_tpu.parallel.graph_parallel import (
    shard_graph_batch,
    make_gp_train_step,
    make_gp_forward,
)

__all__ = [
    "make_mesh",
    "stack_shards",
    "shard_batch_for_mesh",
    "make_dp_train_step",
    "make_dp_eval_step",
    "shard_graph_batch",
    "make_gp_train_step",
    "make_gp_forward",
]
