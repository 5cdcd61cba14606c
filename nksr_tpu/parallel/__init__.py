from .data_parallel import (make_mesh, shard_batch, replicate,
                            dp_train_step, init_distributed,
                            stack_samples)
from . import spatial

__all__ = ["make_mesh", "shard_batch", "replicate", "dp_train_step",
           "init_distributed", "stack_samples", "spatial"]
