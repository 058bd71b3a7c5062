"""Embedding tables for semantic IDs and hashed user IDs (Flax).

Parity target: ``/root/reference/genrec/modules/embedding.py``:
``SemIdEmbedding`` (:7-43) — one table of ``num_embeddings * sem_ids_dim + 1``
rows indexed by ``token_type * num_embeddings + input_id`` with the last row
as padding (kept at zero); ``UserIdEmbedding`` (:46-74) — modulo-hash lookup.

TPU notes: a single fused table keeps the lookup one gather (good for a later
row-sharded layout with all-to-all exchange); the padding row is zero-
initialized and masked on output rather than relying on torch's
``padding_idx`` no-grad semantics — under jit the gradient to the pad row is
killed by the output mask, which is equivalent for training.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SemIdEmbedding(nn.Module):
    """Semantic-ID embedding over a per-level-offset fused vocabulary."""
    num_embeddings: int   # codebook size K per level
    sem_ids_dim: int      # number of levels C
    embeddings_dim: int
    dtype: jnp.dtype = jnp.float32

    @property
    def padding_idx(self) -> int:
        return self.num_embeddings * self.sem_ids_dim

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 token_type_ids: jnp.ndarray) -> jnp.ndarray:
        vocab = self.num_embeddings * self.sem_ids_dim + 1
        table = self.param(
            "embedding", nn.initializers.normal(stddev=1.0),
            (vocab, self.embeddings_dim))
        idx = token_type_ids * self.num_embeddings + input_ids
        # clamp pad ids (== padding_idx) into range, then zero their rows
        is_pad = idx >= self.padding_idx
        safe = jnp.where(is_pad, 0, idx)
        out = jnp.take(table, safe, axis=0).astype(self.dtype)
        return jnp.where(is_pad[..., None], 0.0, out)


class UserIdEmbedding(nn.Module):
    """Hash-bucketed user-id embedding: ``id % num_embeddings`` lookup."""
    num_embeddings: int
    embeddings_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.embeddings_dim))
        hashed = input_ids % self.num_embeddings
        return jnp.take(table, hashed, axis=0).astype(self.dtype)
