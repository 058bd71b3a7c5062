"""Host-side data loader: shuffling, fixed-shape batching, multi-host sharding.

Replaces the reference's ``torch.utils.data.DataLoader`` + HF Accelerate
``split_batches`` semantics (``/root/reference/genrec/trainers/rqvae_trainer.py:
102-118``): the *global* batch size is divided across processes, each host
loads only its shard of every batch, and the incomplete final batch is padded
(with ``valid=False`` rows) instead of dropped so jit sees one shape.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Sequence

import numpy as np

from .batching import pad_batch_rows


class Loader:
    """Deterministic epoch-based loader over an in-memory sample list."""

    def __init__(self, samples: Sequence, batch_size: int,
                 batch_fn: Callable[[List], object], *,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                 process_index: int = 0, process_count: int = 1,
                 transform: Callable = None, prefetch: int = 2):
        """``transform(sample, rng) -> sample``: optional per-sample,
        per-epoch augmentation applied at iteration time (e.g. the P5
        random-crop subsampling, reference p5_amazon.py:469-500).

        ``prefetch``: collate up to this many batches ahead on a background
        thread so host-side batch assembly (tokenization is the LCRec SFT
        hot spot) overlaps device compute — the TPU-era analogue of the
        reference's ``DataLoader(num_workers=16, prefetch_factor=10)``
        (rqvae_trainer.py:111-118). 0 = synchronous. Order and determinism
        are unchanged (single producer thread)."""
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {process_count}")
        self.samples = list(samples)
        self.global_batch_size = batch_size
        self.local_batch_size = batch_size // process_count
        self.batch_fn = batch_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.transform = transform
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.samples)
        if self.drop_last:
            return n // self.global_batch_size
        return (n + self.global_batch_size - 1) // self.global_batch_size

    def __iter__(self) -> Iterator:
        if self.prefetch > 0:
            return self._prefetched_iter()
        return self._sync_iter()

    def _prefetched_iter(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        done = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for batch in self._sync_iter():
                    if not _put(batch):
                        return   # consumer abandoned the epoch early
                _put(done)
            except BaseException as e:  # surface collate errors to consumer
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()   # unblock the producer on early exit
            t.join()

    def _sync_iter(self) -> Iterator:
        order = np.arange(len(self.samples))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        self.epoch += 1
        trng = np.random.default_rng((self.seed + 1, self.epoch))
        take = ((lambda i: self.transform(self.samples[i], trng))
                if self.transform else (lambda i: self.samples[i]))
        gbs, lbs = self.global_batch_size, self.local_batch_size
        for start in range(0, len(order), gbs):
            idx = order[start:start + gbs]
            if len(idx) < gbs and self.drop_last:
                break
            # every host takes a strided slice of the *global* batch
            local = idx[self.process_index::self.process_count][:lbs]
            if len(local) == 0:
                local = idx[:1]  # degenerate tail: keep shapes, mark invalid
                batch = self.batch_fn([take(i) for i in local])
                invalid = np.zeros_like(
                    batch["valid"] if isinstance(batch, dict)
                    else batch.valid)
                if isinstance(batch, dict):
                    batch = {**batch, "valid": invalid}
                else:
                    batch = batch._replace(valid=invalid)
            else:
                batch = self.batch_fn([take(i) for i in local])
            yield pad_batch_rows(batch, lbs)


def cycle(loader: Loader):
    """Endless iterator (reference ``data/utils.py:7-13``)."""
    while True:
        yield from loader
