"""Batch schemas shared across the data layer and models.

Parity target: ``/root/reference/genrec/data/schemas.py:7-36`` (``SeqData``,
``SeqBatch``, ``TokenizedSeqBatch``). Fields are numpy/JAX arrays; every batch
carries a ``valid`` row mask because jit wants fixed batch shapes and the last
batch of an epoch is padded rather than dropped.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

FUT_SUFFIX = "_fut"


class SeqData(NamedTuple):
    """One example: a user, their (flattened) history, and the target ids."""
    user_id: int
    item_ids: list
    target_ids: list


class SeqBatch(NamedTuple):
    """Raw item-id sequence batch (SASRec/HSTU style)."""
    user_ids: np.ndarray          # (B,)
    ids: np.ndarray               # (B, L) int32, 0 = pad
    ids_fut: np.ndarray           # (B, L) or (B,) future/target ids
    x: Optional[np.ndarray] = None        # optional dense features
    seq_mask: Optional[np.ndarray] = None  # (B, L) bool, True = real token
    valid: Optional[np.ndarray] = None     # (B,) bool, True = real row


class TokenizedSeqBatch(NamedTuple):
    """Semantic-id token batch (TIGER style)."""
    user_ids: np.ndarray          # (B,)
    sem_ids: np.ndarray           # (B, T) flattened history codes
    sem_ids_fut: np.ndarray       # (B, C) target codes
    token_type_ids: np.ndarray    # (B, T) level index cycling 0..C-1
    token_type_ids_fut: np.ndarray  # (B, C)
    seq_mask: np.ndarray          # (B, T) bool, True = real token
    valid: Optional[np.ndarray] = None  # (B,) bool
