from fastegnn_tpu.parallel.mesh import make_mesh
from fastegnn_tpu.parallel.data_parallel import (
    stack_shards,
    shard_batch_for_mesh,
    make_dp_train_step,
    make_dp_eval_step,
    iter_dp_batches,
)
from fastegnn_tpu.parallel.owner_graph import (
    OwnerBatchFactory,
    iter_owner_sharded_batches,
    make_owner_gp_eval_step,
    make_owner_gp_forward,
    make_owner_gp_train_step,
    make_owner_sharded_batch,
)

__all__ = [
    "make_mesh",
    "stack_shards",
    "shard_batch_for_mesh",
    "make_dp_train_step",
    "make_dp_eval_step",
    "iter_dp_batches",
    "OwnerBatchFactory",
    "iter_owner_sharded_batches",
    "make_owner_gp_eval_step",
    "make_owner_gp_forward",
    "make_owner_gp_train_step",
    "make_owner_sharded_batch",
]
