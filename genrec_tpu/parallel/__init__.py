from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch,
                   batch_sharding, replicated_sharding)
from .sharding import apply_shardings, fsdp_shardings, param_shardings
from .pipeline import (PIPE_AXIS, PipelinedLM, from_pipeline_params,
                       make_pipeline_mesh, pipeline_blocks,
                       pipeline_param_shardings, to_pipeline_params)
from .ring import (SequenceParallelLM, make_ring_silu_attention,
                   ring_attention)
from .multihost import host_barrier, maybe_initialize_distributed

__all__ = ["DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "make_mesh",
           "shard_batch", "batch_sharding", "replicated_sharding",
           "apply_shardings", "param_shardings", "fsdp_shardings",
           "PipelinedLM", "from_pipeline_params", "make_pipeline_mesh",
           "pipeline_blocks", "pipeline_param_shardings",
           "to_pipeline_params", "SequenceParallelLM", "ring_attention",
           "make_ring_silu_attention",
           "host_barrier", "maybe_initialize_distributed"]
