"""Debug metrics + small tensor utilities.

Parity target: ``/root/reference/genrec/modules/utils.py``:
``select_columns_per_row`` (:56-70) and ``compute_debug_metrics`` (:101-137 —
sequence-length quantiles and per-digit loss break-down). The reference's
``eval_mode`` / ``reset_kv_cache`` decorators are torch-module state
management with no JAX analogue (eval is an explicit ``deterministic`` flag
and there is no mutable cache), so they are intentionally absent.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def select_columns_per_row(x: jnp.ndarray,
                           indices: jnp.ndarray) -> jnp.ndarray:
    """Per-row column gather: out[i, j] = x[i, indices[i, j]]."""
    return jnp.take_along_axis(x, indices, axis=1)


def compute_debug_metrics(seq_mask: jnp.ndarray,
                          per_position_loss: Optional[jnp.ndarray] = None,
                          sem_id_dim: int = 0,
                          prefix: str = "debug/") -> Dict[str, jnp.ndarray]:
    """Sequence-length quantiles + per-digit loss breakdown.

    Args:
      seq_mask: (B, T) bool of real tokens.
      per_position_loss: optional (B, C) per-target-digit losses.
      sem_id_dim: number of digits C (for labeling).
    """
    lengths = jnp.sum(seq_mask.astype(jnp.float32), axis=1)
    out = {f"{prefix}seq_len_mean": jnp.mean(lengths),
           f"{prefix}seq_len_p50": jnp.percentile(lengths, 50),
           f"{prefix}seq_len_p90": jnp.percentile(lengths, 90),
           f"{prefix}seq_len_max": jnp.max(lengths)}
    if per_position_loss is not None:
        for c in range(sem_id_dim or per_position_loss.shape[1]):
            out[f"{prefix}loss_digit_{c}"] = jnp.mean(
                per_position_loss[:, c])
    return out
