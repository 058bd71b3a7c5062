"""Fixed-shape batch builders for each model family.

Parity targets: ``sasrec_collate_fn`` / ``sasrec_eval_collate_fn``
(``/root/reference/genrec/data/amazon_sasrec.py:125-181``), the HSTU variants
carrying per-event timestamps (``amazon_hstu.py:137-200``), and TIGER's
``pad_collate`` (``trainers/tiger_trainer.py:27-80``).

TPU-first change: the reference pads to the per-batch max length, which under
jit would trigger one recompile per distinct length; here every batch is
padded to the static ``max_seq_len`` so one compiled program serves the whole
run. SASRec/HSTU use left-padding with 0 (ids are 1-based, 0 = pad) exactly
like the original TF implementation.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .schemas import SeqBatch, TokenizedSeqBatch
from .sequences import Sample


def sasrec_train_batch(samples: Sequence[Sample], max_seq_len: int,
                       with_time: bool = False) -> SeqBatch:
    """Left-padded (input, per-position-target) pairs; ids shifted to 1-based."""
    B = len(samples)
    L = max_seq_len
    ids = np.zeros((B, L), np.int32)
    tgt = np.zeros((B, L), np.int32)
    ts = np.zeros((B, L), np.int32) if with_time else None
    uids = np.zeros((B,), np.int32)
    for r, s in enumerate(samples):
        seq = [i + 1 for i in s.history] + [s.target + 1]
        seq = seq[-(L + 1):]
        n = len(seq) - 1
        ids[r, L - n:] = seq[:-1]
        tgt[r, L - n:] = seq[1:]
        uids[r] = s.user_id
        if with_time:
            tt = list(s.timestamps or []) + [s.target_timestamp or 0]
            tt = tt[-(L + 1):]
            ts[r, L - n:] = tt[:-1]
    return SeqBatch(user_ids=uids, ids=ids, ids_fut=tgt, x=ts,
                    seq_mask=ids != 0,
                    valid=np.ones((B,), bool))


def sasrec_eval_batch(samples: Sequence[Sample], max_seq_len: int,
                      with_time: bool = False) -> SeqBatch:
    """Left-padded history with a single (B,) target."""
    B = len(samples)
    L = max_seq_len
    ids = np.zeros((B, L), np.int32)
    ts = np.zeros((B, L), np.int32) if with_time else None
    tgt = np.zeros((B,), np.int32)
    uids = np.zeros((B,), np.int32)
    for r, s in enumerate(samples):
        hist = [i + 1 for i in s.history][-L:]
        ids[r, L - len(hist):] = hist
        tgt[r] = s.target + 1
        uids[r] = s.user_id
        if with_time:
            tt = list(s.timestamps or [])[-L:]
            ts[r, L - len(tt):] = tt
    return SeqBatch(user_ids=uids, ids=ids, ids_fut=tgt, x=ts,
                    seq_mask=ids != 0,
                    valid=np.ones((B,), bool))


def tiger_batch(samples: Sequence[Sample], sem_ids: np.ndarray,
                max_seq_len: int, pad_id: int) -> TokenizedSeqBatch:
    """Flatten per-item semantic codes into right-padded token sequences.

    ``sem_ids``: (num_items, C) code table from the RQ-VAE artifact.
    ``pad_id`` = ``num_item_embeddings * sem_id_dim`` (reference
    tiger_trainer.py:167): pad positions store ``pad_id`` with
    ``token_type_id`` 0 and are masked out via ``seq_mask``.
    """
    B = len(samples)
    C = sem_ids.shape[1]
    T = max_seq_len * C
    out_ids = np.full((B, T), pad_id, np.int32)
    out_types = np.zeros((B, T), np.int32)
    fut_ids = np.zeros((B, C), np.int32)
    mask = np.zeros((B, T), bool)
    uids = np.zeros((B,), np.int32)
    level = np.arange(C, dtype=np.int32)
    for r, s in enumerate(samples):
        hist = s.history[-max_seq_len:]
        n = len(hist) * C
        codes = sem_ids[np.asarray(hist, np.int64)]      # (n_items, C)
        out_ids[r, :n] = codes.reshape(-1)
        out_types[r, :n] = np.tile(level, len(hist))
        mask[r, :n] = True
        fut_ids[r] = sem_ids[s.target]
        uids[r] = s.user_id
    return TokenizedSeqBatch(
        user_ids=uids, sem_ids=out_ids, sem_ids_fut=fut_ids,
        token_type_ids=out_types,
        token_type_ids_fut=np.tile(level, (B, 1)),
        seq_mask=mask, valid=np.ones((B,), bool))


def pad_batch_rows(batch, target_rows: int):
    """Pad a batch (NamedTuple or dict, with a ``valid`` row mask) to
    ``target_rows`` rows, marking the padding rows invalid."""
    is_dict = isinstance(batch, dict)
    items = batch.items() if is_dict else zip(batch._fields, batch)
    valid = batch["valid"] if is_dict else batch.valid
    if valid is not None and len(valid) == target_rows:
        return batch
    orig_rows = len(valid)

    def pad(arr):
        # fields not aligned with the batch axis (e.g. COBRA's deduped
        # (U, L) unique text rows) pass through untouched
        if arr is None or arr.shape[0] != orig_rows:
            return arr
        reps = np.zeros((target_rows - arr.shape[0],) + arr.shape[1:],
                        arr.dtype)
        return np.concatenate([arr, reps], axis=0)

    fields = {}
    for name, arr in items:
        if name == "valid":
            fields[name] = np.concatenate(
                [arr, np.zeros((target_rows - arr.shape[0],), bool)])
        else:
            fields[name] = pad(arr)
    return fields if is_dict else type(batch)(**fields)
