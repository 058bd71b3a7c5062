"""Functional normalization ops.

Parity target: ``/root/reference/genrec/modules/normalize.py:11-35`` (l2norm).
Module (Flax) variants live in :mod:`genrec_tpu.nn.normalize`.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis``.

    Matches ``torch.nn.functional.normalize``: divides by
    ``max(||x||_2, eps)`` so zero vectors map to zero, not NaN.
    """
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
