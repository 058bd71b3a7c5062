"""Sharded full-catalog top-k scoring.

The north-star "sharded top-k scoring kernel" (SURVEY.md §7): the reference
computes ``logits = x @ E_itemᵀ`` over the whole catalog on one device
(``/root/reference/genrec/models/sasrec.py:121``) and scans rows in Python.
At catalog scale the item-embedding table is row-sharded over the ``model``
mesh axis; each shard computes its local (B, V/m) scores and local top-k,
then an all-gather of the tiny (B, k) candidate sets + a final merge yields
the exact global top-k — communicating ``m·k`` candidates per row instead of
``V`` scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from genrec_tpu.parallel.mesh import MODEL_AXIS


def topk_scores_local(hidden: jnp.ndarray, table: jnp.ndarray, k: int,
                      offset: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Local shard: scores = hidden @ tableᵀ, local top-k, global indices."""
    scores = jnp.einsum("bd,vd->bv", hidden, table,
                        preferred_element_type=jnp.float32)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx + offset


def sharded_topk(mesh: Mesh, hidden: jnp.ndarray, table: jnp.ndarray,
                 k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact global top-k of ``hidden @ tableᵀ`` with ``table`` row-sharded.

    Args:
      hidden: (B, D), replicated (or data-sharded; see note).
      table: (V, D), sharded ``P(model, None)`` over ``mesh``.
      k: candidates to return.
    Returns:
      (values, indices): (B, k) global scores and row indices into ``table``.
    """
    m = mesh.shape[MODEL_AXIS]
    V = table.shape[0]
    shard_rows = V // m

    def local(hidden, table_shard):
        rank = jax.lax.axis_index(MODEL_AXIS)
        vals, idx = topk_scores_local(hidden, table_shard, k,
                                      rank * shard_rows)
        # (m, B, k) candidates on every shard
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS)
        all_idx = jax.lax.all_gather(idx, MODEL_AXIS)
        B = hidden.shape[0]
        cat_vals = all_vals.transpose(1, 0, 2).reshape(B, m * k)
        cat_idx = all_idx.transpose(1, 0, 2).reshape(B, m * k)
        best_vals, pos = jax.lax.top_k(cat_vals, k)
        best_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        return best_vals, best_idx

    # check_vma=False: after the all_gather every shard holds identical
    # (B, k) results — replication that shard_map cannot statically infer.
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(MODEL_AXIS, None)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(hidden, table)


def full_topk(hidden: jnp.ndarray, table: jnp.ndarray,
              k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device reference path."""
    return topk_scores_local(hidden, table, k, 0)
