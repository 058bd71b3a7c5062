from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch,
                   batch_sharding, replicated_sharding)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "shard_batch",
           "batch_sharding", "replicated_sharding"]
