"""Functional normalization ops.

Parity target: ``/root/reference/genrec/modules/normalize.py:11-35`` (l2norm).
Module (Flax) variants live in :mod:`genrec_tpu.nn.normalize`.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis``.

    Matches ``torch.nn.functional.normalize`` (divide by ``max(||x||, eps)``)
    but is gradient-safe at ``x == 0``: the max is applied to the *squared*
    norm before the sqrt, so the backward never evaluates ``d sqrt(0)`` —
    ``jnp.linalg.norm`` + ``maximum`` yields ``0 * inf = NaN`` grads for
    exactly-zero rows (e.g. all-pad text pooled to zero at init).
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm
