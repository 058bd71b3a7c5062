"""COBRA batches: semantic IDs + per-item tokenized text.

Parity target: ``/root/reference/genrec/data/amazon_cobra.py`` (sem IDs +
tokenized text, max_text_len=128, fixed-length padding :217-227; one sample
per user, teacher-forcing rationale :168-209) and the train collate that
appends the target item to the input (``trainers/cobra_trainer.py:25-88``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from genrec_tpu.configlib import gin
from .sequences import Sample


class CobraBatch(NamedTuple):
    input_ids: np.ndarray        # (B, T*C) codes, pad_id padded
    encoder_input_ids: np.ndarray  # (B, T, L_text) — or (U, L_text) deduped
    target_item: np.ndarray      # (B,) raw item id of the target
    target_sem_ids: np.ndarray   # (B, C)
    valid: np.ndarray            # (B,)
    text_idx: np.ndarray = None  # (B, T) row into encoder_input_ids (dedupe)


def _dedupe_rows(item_mat: np.ndarray, item_tokens: np.ndarray):
    """(B, T) item ids (-1 = pad) → unique token rows + gather index.

    The encoder is the dominant COBRA cost (O(B·T) 128-token texts per
    step); popular items recur across the batch, so encoding each UNIQUE
    item once and gathering back is the same math at catalog-bounded cost.
    Rows are padded to the next power of two so jit sees a handful of
    static bucket shapes instead of a fresh compile per batch.
    Row 0 is the all-zero "pad text" every -1 position points at.
    """
    L_text = item_tokens.shape[1]
    uniq, inv = np.unique(item_mat + 1, return_inverse=True)  # 0 = pad text
    if uniq[0] != 0:                         # keep row 0 = pad text always
        uniq = np.concatenate([[0], uniq])
        inv = inv + 1
    U = len(uniq)
    U_pad = max(8, 1 << (U - 1).bit_length())
    rows = np.zeros((U_pad, L_text), item_tokens.dtype)
    rows[1:U] = item_tokens[uniq[1:] - 1]
    return rows, inv.reshape(item_mat.shape).astype(np.int32)


def cobra_batch(samples: Sequence[Sample], sem_ids: np.ndarray,
                item_tokens: np.ndarray, max_items: int, pad_id: int,
                include_target: bool,
                dedupe_texts: bool = False) -> CobraBatch:
    """``include_target=True`` appends the target item (teacher forcing).

    ``dedupe_texts=True`` emits ``encoder_input_ids`` as the batch's
    unique item-text rows plus a ``text_idx`` gather map (see
    :func:`_dedupe_rows`); the model's ``vecs[text_idx]`` gather restores
    the (B, T, D) layout on device.
    """
    B = len(samples)
    C = sem_ids.shape[1]
    L_text = item_tokens.shape[1]
    T = max_items
    ids = np.full((B, T * C), pad_id, np.int32)
    item_mat = np.full((B, T), -1, np.int64)
    tgt_item = np.zeros((B,), np.int32)
    tgt_sem = np.zeros((B, C), np.int32)
    for r, s in enumerate(samples):
        items = list(s.history)
        if include_target:
            items = items + [s.target]
        items = items[-T:]
        codes = sem_ids[np.asarray(items, np.int64)]
        ids[r, :len(items) * C] = codes.reshape(-1)
        item_mat[r, :len(items)] = items
        tgt_item[r] = s.target
        tgt_sem[r] = sem_ids[s.target]
    if dedupe_texts:
        toks, text_idx = _dedupe_rows(item_mat, item_tokens)
    else:
        toks = np.where(item_mat[..., None] >= 0,
                        item_tokens[np.maximum(item_mat, 0)], 0
                        ).astype(np.int32)
        text_idx = None
    return CobraBatch(input_ids=ids, encoder_input_ids=toks,
                      target_item=tgt_item, target_sem_ids=tgt_sem,
                      valid=np.ones((B,), bool), text_idx=text_idx)


@gin.configurable
def synthetic_item_tokens(n_items: int = 2000, n_clusters: int = 32,
                          vocab_size: int = 32128, text_len: int = 16,
                          tokens_per_cluster: int = 24,
                          seed: int = 0) -> np.ndarray:
    """Cluster-correlated synthetic token sequences (COBRA's text stand-in).

    Items in the same cluster share a token pool, so the dense tower can
    learn cluster structure just like real item text.
    """
    from .synthetic import make_catalog
    catalog = make_catalog(n_items=n_items, n_clusters=n_clusters, seed=seed)
    rng = np.random.default_rng(seed + 7)
    pools = rng.integers(1, vocab_size,
                         size=(n_clusters, tokens_per_cluster))
    out = np.zeros((n_items, text_len), np.int32)
    for i in range(n_items):
        pool = pools[catalog.clusters[i]]
        n = int(rng.integers(text_len // 2, text_len + 1))
        out[i, :n] = rng.choice(pool, size=n)
    return out


def amazon_item_tokens(root: str, split: str, text_len: int = 128,
                       vocab_size: int = 32128) -> np.ndarray:
    """Tokenize item texts with a local HF tokenizer if available, else a
    deterministic hash tokenizer (zero-egress fallback)."""
    from .amazon import AmazonRaw
    raw = AmazonRaw(root, split)
    raw.ensure_downloaded()
    mapping = raw.item_id_mapping()
    texts = raw.item_texts(mapping)
    from .sequences import hash_user_id
    out = np.zeros((len(texts), text_len), np.int32)
    for i, text in enumerate(texts):
        words = text.lower().split()[:text_len]
        for j, w in enumerate(words):
            # stable FNV-based hash (Python's str hash is per-process salted)
            out[i, j] = hash_user_id(w, vocab_size - 1) + 1
    return out
