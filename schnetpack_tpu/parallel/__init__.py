from .data_parallel import (
    make_parallel_eval_step,
    make_parallel_train_step,
    shard_global_batch,
    split_loader_for_mesh,
    stack_device_batches,
)
from .mesh import make_mesh

__all__ = [
    "make_parallel_eval_step", "make_parallel_train_step",
    "shard_global_batch", "split_loader_for_mesh", "stack_device_batches",
    "make_mesh",
]
