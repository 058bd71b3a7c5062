"""Recall@K / NDCG@K metrics.

Parity target: ``/root/reference/genrec/modules/metrics.py``
(``TopKAccumulator.accumulate`` :26-66, ``.reduce`` :68-74): exact-tuple match
of (B, D) targets against (B, K, D) beams, rank of first match, DCG = 1 /
log2(rank + 2), IDCG = 1.

TPU-first redesign: the per-batch device work is a pure function
(:func:`topk_metric_sums`) returning metric *sums* so it can run inside a jit
step and be reduced across devices with ``psum`` — the reference instead
accumulates Python floats per batch on the host. The host-side
:class:`TopKAccumulator` keeps the reference's stateful API for trainers.
Rows may be excluded (padding in fixed-shape eval batches) via ``valid``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def topk_match_ranks(actual: jnp.ndarray, top_k: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-indexed) of the first exact-tuple match, or K if absent.

    Args:
      actual: (B, D) ground-truth id tuples (D=1 for raw item ids).
      top_k:  (B, K, D) ranked predictions.
    Returns:
      (B,) int32 ranks in [0, K].
    """
    K = top_k.shape[1]
    matches = jnp.all(actual[:, None, :] == top_k, axis=-1)  # (B, K)
    found = jnp.any(matches, axis=1)
    first = jnp.argmax(matches, axis=1).astype(jnp.int32)
    return jnp.where(found, first, jnp.int32(K))


def topk_metric_sums(actual: jnp.ndarray, top_k: jnp.ndarray,
                     ks: Sequence[int],
                     valid: jnp.ndarray | None = None) -> Dict[str, jnp.ndarray]:
    """Per-batch metric sums (not means): psum/accumulate these, divide once."""
    ranks = topk_match_ranks(actual, top_k)
    if valid is None:
        valid = jnp.ones(ranks.shape, dtype=jnp.float32)
    else:
        valid = valid.astype(jnp.float32)
    out: Dict[str, jnp.ndarray] = {"count": jnp.sum(valid)}
    dcg = 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0)
    for k in ks:
        hit = (ranks < k).astype(jnp.float32) * valid
        out[f"recall_sum@{k}"] = jnp.sum(hit)
        out[f"ndcg_sum@{k}"] = jnp.sum(hit * dcg)
    return out


class TopKAccumulator:
    """Streaming accumulator with the reference's accumulate/reduce API."""

    def __init__(self, ks: Sequence[int] = (1, 5, 10)):
        self.ks = tuple(ks)
        self.reset()

    def reset(self) -> None:
        self.total = 0.0
        self.recalls = {k: 0.0 for k in self.ks}
        self.ndcgs = {k: 0.0 for k in self.ks}

    def accumulate(self, actual, top_k, valid=None) -> None:
        sums = topk_metric_sums(jnp.asarray(actual), jnp.asarray(top_k),
                                self.ks, valid)
        sums = {k: float(np.asarray(v)) for k, v in sums.items()}
        self.total += sums["count"]
        for k in self.ks:
            self.recalls[k] += sums[f"recall_sum@{k}"]
            self.ndcgs[k] += sums[f"ndcg_sum@{k}"]

    def update_sums(self, sums: Dict[str, float]) -> None:
        """Accumulate pre-computed (possibly psum-reduced) metric sums."""
        self.total += float(sums["count"])
        for k in self.ks:
            self.recalls[k] += float(sums[f"recall_sum@{k}"])
            self.ndcgs[k] += float(sums[f"ndcg_sum@{k}"])

    def reduce(self) -> Dict[str, float]:
        denom = self.total if self.total > 0 else 1.0
        out: Dict[str, float] = {}
        for k in self.ks:
            out[f"Recall@{k}"] = self.recalls[k] / denom
            out[f"NDCG@{k}"] = self.ndcgs[k] / denom
        return out


def sem_id_detail_sums(actual: jnp.ndarray, top1: jnp.ndarray,
                       valid: jnp.ndarray | None = None,
                       catalog_codes: jnp.ndarray | None = None,
                       codebook_size: int = 0) -> Dict[str, jnp.ndarray]:
    """LCRec eval-depth sums (reference parity:
    ``/root/reference/genrec/trainers/lcrec_trainer.py:231-260``):
    per-codebook top-1 accuracy, exact-match rate and invalid-generation
    count (top-1 tuple not in the item catalog — the compiled constrained
    decode always emits per-level-legal tokens, so "invalid" here means
    "no such item", the analogue of the reference's unparseable strings).

    Args:
      actual: (B, C) target codes; top1: (B, C) the best beam.
      catalog_codes: optional (N, C) table of existing items.
    Returns sums keyed ``codebook_acc_sum@c`` / ``exact_match_sum`` /
    ``invalid_sum`` plus ``count``.
    """
    C = actual.shape[1]
    if valid is None:
        valid = jnp.ones(actual.shape[:1], dtype=jnp.float32)
    else:
        valid = valid.astype(jnp.float32)
    out: Dict[str, jnp.ndarray] = {"count": jnp.sum(valid)}
    pos = (actual == top1).astype(jnp.float32)            # (B, C)
    for c in range(C):
        out[f"codebook_acc_sum@{c}"] = jnp.sum(pos[:, c] * valid)
    out["exact_match_sum"] = jnp.sum(jnp.all(actual == top1,
                                             axis=-1) * valid)
    if catalog_codes is not None and codebook_size:
        exists = catalog_membership(catalog_codes, top1, codebook_size)
        out["invalid_sum"] = jnp.sum((~exists).astype(jnp.float32) * valid)
    return out


def catalog_membership(catalog_codes: jnp.ndarray, queries: jnp.ndarray,
                       codebook_size: int) -> jnp.ndarray:
    """Exact membership of (..., C) code tuples in an (N, C) catalog.

    int32-safe at any depth: a raw radix key needs C·log2(K) bits (40 at the
    reference LCRec config of 5×256 codebooks,
    ``/root/reference/config/lcrec/amazon/lcrec.gin``) and JAX silently
    truncates int64 to int32 without x64 mode. Instead keys are *re-based
    per level* — the same technique as ``decoding/trie.py`` PackedTrie —
    with a level's key being ``prefix_rank * K + code`` where prefix_rank is
    the searchsorted-left position of the row's prefix key among the sorted
    catalog prefix keys (ties collapse to one rank, which is exactly the
    dedup re-basing needs). Keys stay < N·K, so this is safe whenever
    N·K < 2^31 (~8.4M items at K=256). Fully jit-compatible: only sorts and
    binary searches, no unique().
    """
    C = catalog_codes.shape[-1]
    K = jnp.int32(codebook_size)
    if int(catalog_codes.shape[0]) * int(codebook_size) >= 2 ** 31:
        raise ValueError(
            f"{catalog_codes.shape[0]} items x {codebook_size} codes "
            "exceeds int32 re-based keys")
    cat_key = catalog_codes[:, 0].astype(jnp.int32)
    q_key = queries[..., 0].astype(jnp.int32)
    alive = jnp.ones(queries.shape[:-1], bool)
    for c in range(1, C):
        sorted_keys = jnp.sort(cat_key)
        cat_rank = jnp.searchsorted(sorted_keys, cat_key).astype(jnp.int32)
        q_idx = jnp.clip(jnp.searchsorted(sorted_keys, q_key),
                         0, sorted_keys.shape[0] - 1)
        alive = alive & (sorted_keys[q_idx] == q_key)
        cat_key = cat_rank * K + catalog_codes[:, c].astype(jnp.int32)
        # dead queries get key -1, which no catalog key (all >= 0) matches
        q_key = jnp.where(alive,
                          q_idx.astype(jnp.int32) * K
                          + queries[..., c].astype(jnp.int32),
                          jnp.int32(-1))
    sorted_keys = jnp.sort(cat_key)
    q_idx = jnp.clip(jnp.searchsorted(sorted_keys, q_key),
                     0, sorted_keys.shape[0] - 1)
    return alive & (sorted_keys[q_idx] == q_key)
