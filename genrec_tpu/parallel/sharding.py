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


def apply_shardings(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
