"""Parameter-sharding rules: which tables split over the ``model`` axis.

The north-star design (BASELINE.json): item-embedding / codebook / output-head
tables are row-sharded across the model axis of the pod slice, dense towers
and transformer stacks run data-parallel (replicated over ``data``). XLA
derives the collectives (all-gather for the sharded matmuls' results,
reduce-scatter in the backward) from these annotations — no hand-written
comms.

Heuristic rule: any 2-D parameter whose first dimension is a vocabulary-like
axis (≥ ``min_rows`` rows) is sharded ``P("model", None)``; everything else is
replicated. This covers SASRec/HSTU ``item_embedding``, TIGER's
``sem_id_embedding``/``output_head`` and the RQ-VAE codebooks at scale.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _is_table(path: tuple, leaf) -> bool:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    joined = "/".join(str(n) for n in names).lower()
    return any(k in joined for k in
               ("embedding", "output_head", "item_embedding"))


def param_shardings(mesh: Mesh, params: Any, min_rows: int = 1024) -> Any:
    """PyTree of NamedShardings for ``params`` over ``mesh``."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if (model_size > 1 and leaf.ndim >= 2 and _is_table(path, leaf)
                and leaf.shape[0] >= min_rows
                and leaf.shape[0] % model_size == 0):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_shardings(mesh: Mesh, params: Any, min_size: int = 2 ** 16) -> Any:
    """ZeRO-3/FSDP placement: every large parameter is sharded over the
    DATA axis (the batch axis), on its first dimension divisible by the
    axis size. XLA's SPMD partitioner inserts the per-layer all-gathers
    in the forward/backward and reduce-scatters the grads; optimizer
    state computed from placed params inherits the same shardings, so
    param + grad + Adam memory all scale 1/N over the slice. This is the
    memory strategy for full fine-tuning of LCRec's Qwen2.5-class
    backbone (reference trains it full-FT,
    /root/reference/config/lcrec/amazon/lcrec.gin:12-48), which cannot
    fit one chip's HBM with fp32 Adam state.

    Small leaves (< ``min_size`` elements: norm scales, biases, LoRA
    adapters) stay replicated — sharding them costs more in collective
    latency than it saves.
    """
    from .mesh import DATA_AXIS
    n = mesh.shape[DATA_AXIS]

    def rule(path, leaf):
        del path
        if n > 1 and leaf.size >= min_size:
            for ax, dim in enumerate(leaf.shape):
                if dim >= n and dim % n == 0:
                    spec = [None] * leaf.ndim
                    spec[ax] = DATA_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_shardings(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
