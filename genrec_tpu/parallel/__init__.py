from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch,
                   batch_sharding, replicated_sharding)
from .sharding import apply_shardings, param_shardings
from .multihost import host_barrier, maybe_initialize_distributed

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "shard_batch",
           "batch_sharding", "replicated_sharding", "apply_shardings",
           "param_shardings", "host_barrier",
           "maybe_initialize_distributed"]
