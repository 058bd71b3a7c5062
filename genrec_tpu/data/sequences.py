"""Generic user-sequence corpus and train/valid/test sample generation.

This factors out the sample-generation logic the reference repeats in each
dataset class (``/root/reference/genrec/data/amazon.py:392-444`` for TIGER,
``amazon_sasrec.py:80-112``, ``amazon_hstu.py`` etc.): sliding-window training
samples over ``seq[:-2]`` and leave-one-out valid (target = ``seq[-2]``) /
test (target = ``seq[-1]``) evaluation, with user-id hashing into a fixed
bucket count. One corpus feeds every model family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence


def hash_user_id(raw_user_id: str | int, num_buckets: int = 10000) -> int:
    """Stable (process-independent) user-id hash.

    The reference uses Python's ``hash()`` (``amazon.py:414``), which is
    randomized per process for strings; we use a deterministic FNV-1a so
    dataset artifacts are reproducible across runs and hosts.
    """
    data = str(raw_user_id).encode("utf-8")
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % num_buckets


@dataclass
class Sample:
    user_id: int
    history: List[int]       # raw 0-based item ids
    target: int
    timestamps: Optional[List[int]] = None
    target_timestamp: Optional[int] = None


@dataclass
class SequenceCorpus:
    """All user sequences for one dataset split (category)."""
    sequences: List[List[int]]                 # per-user item-id lists, time-sorted
    user_ids: List[int]                        # hashed user ids
    timestamps: Optional[List[List[int]]] = None
    num_items: int = 0

    def __post_init__(self):
        if self.num_items == 0 and self.sequences:
            self.num_items = 1 + max(max(s) for s in self.sequences if s)

    def generate_samples(self, split: str,
                         min_train_history: int = 1) -> List[Sample]:
        """Sliding-window train / leave-one-out valid & test samples."""
        samples: List[Sample] = []
        for idx, full_seq in enumerate(self.sequences):
            uid = self.user_ids[idx]
            ts = self.timestamps[idx] if self.timestamps else None
            if split == "train":
                seq = full_seq[:-2]
                for i in range(min_train_history, len(seq)):
                    samples.append(Sample(
                        user_id=uid, history=seq[:i], target=seq[i],
                        timestamps=ts[:i] if ts else None,
                        target_timestamp=ts[i] if ts else None))
            elif split == "valid":
                seq = full_seq[:-1]
                if len(seq) < 2:
                    continue
                samples.append(Sample(
                    user_id=uid, history=seq[:-1], target=seq[-1],
                    timestamps=ts[:len(seq) - 1] if ts else None,
                    target_timestamp=ts[len(seq) - 1] if ts else None))
            elif split == "test":
                if len(full_seq) < 2:
                    continue
                samples.append(Sample(
                    user_id=uid, history=full_seq[:-1], target=full_seq[-1],
                    timestamps=ts[:len(full_seq) - 1] if ts else None,
                    target_timestamp=ts[len(full_seq) - 1] if ts else None))
            else:
                raise ValueError(f"Unknown split: {split!r}")
        return samples


def build_corpus(events: Dict[str, List[tuple]], min_seq_len: int = 5,
                 num_user_buckets: int = 10000) -> SequenceCorpus:
    """Build a corpus from ``{raw_user_id: [(timestamp, item_id), ...]}``.

    Sequences are time-sorted; users with fewer than ``min_seq_len`` items are
    dropped (reference: ``amazon.py:380-388``).
    """
    sequences, user_ids, timestamps = [], [], []
    for raw_uid, evts in events.items():
        evts = sorted(evts, key=lambda e: e[0])
        if len(evts) < min_seq_len:
            continue
        sequences.append([e[1] for e in evts])
        timestamps.append([int(e[0]) for e in evts])
        user_ids.append(hash_user_id(raw_uid, num_user_buckets))
    return SequenceCorpus(sequences=sequences, user_ids=user_ids,
                          timestamps=timestamps)
