"""Host-side batched application of a jit function over a large array."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def batched_apply(fn: Callable, array: np.ndarray,
                  batch_size: int) -> np.ndarray:
    """Apply ``fn(chunk)`` over fixed-size chunks of ``array`` (padding the
    tail so the compiled executable is reused) and concatenate the results.

    Used for whole-catalog sweeps: semantic-id encoding
    (rqvae_trainer.compute_semantic_ids) and dense-vector recompute
    (cobra_trainer.compute_item_dense_vecs).
    """
    N = len(array)
    pad = (-N) % batch_size
    padded = np.concatenate(
        [array, np.zeros((pad,) + array.shape[1:], array.dtype)]) \
        if pad else array
    outs = [np.asarray(fn(jnp.asarray(padded[i:i + batch_size])))
            for i in range(0, len(padded), batch_size)]
    return np.concatenate(outs)[:N]
