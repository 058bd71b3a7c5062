"""P5-format Amazon pipeline (legacy data path).

Parity target: ``/root/reference/genrec/data/p5_amazon.py`` — parses the P5
preprocessed release (``sequential_data.txt``: one line per user,
``user_id item1 item2 ...`` with 1-based item ids; ``datamaps.json`` id
maps; item metadata) into train (full prefix) / val (target = ``seq[-2]``) /
test (target = ``seq[-1]``) splits (:287-316), item-level 95/5 splits seeded
42 for RQ-VAE training (:370-406), and train-time **random-crop
subsampling** of windows (:469-500). The reference's Google-Drive download
(:237-279) and torch-geometric ``HeteroData`` container are replaced by a
gated file check and plain numpy arrays.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from genrec_tpu.configlib import gin
from .sequences import Sample, SequenceCorpus
from .text_encoder import make_text_encoder

P5_DOWNLOAD_HINT = (
    "Provision the P5 preprocessed data (P5_data.zip from the P5 paper "
    "release) into {path} — this environment cannot download it.")


class P5Raw:
    def __init__(self, root: str = "dataset/amazon", split: str = "beauty"):
        self.root = root
        self.split = split
        self.dir = os.path.join(root, "raw", split)
        self.seq_path = os.path.join(self.dir, "sequential_data.txt")

    def ensure_present(self) -> None:
        if not os.path.exists(self.seq_path):
            raise FileNotFoundError(
                f"{self.seq_path} missing. "
                + P5_DOWNLOAD_HINT.format(path=self.dir))

    def sequences(self) -> tuple[List[int], List[List[int]]]:
        """Parse ``sequential_data.txt`` → (user_ids, 0-based item seqs)."""
        self.ensure_present()
        users, seqs = [], []
        with open(self.seq_path) as f:
            for line in f:
                parts = list(map(int, line.split()))
                if len(parts) < 4:
                    continue
                users.append(parts[0])
                seqs.append([i - 1 for i in parts[1:]])   # remap to 0-based
        return users, seqs

    def item_texts(self) -> Optional[List[str]]:
        """Item texts from datamaps + meta if present (id order)."""
        dm_path = os.path.join(self.dir, "datamaps.json")
        meta_path = os.path.join(self.dir, "meta.json.gz")
        if not (os.path.exists(dm_path) and os.path.exists(meta_path)):
            return None
        with open(dm_path) as f:
            datamaps = json.load(f)
        id2asin = {int(v) - 1: k for k, v in datamaps["item2id"].items()}
        from .amazon import format_item_text, parse_gzip_json
        metas = {}
        for m in parse_gzip_json(meta_path):
            metas[m.get("asin")] = m
        n = len(id2asin)
        return [format_item_text(metas.get(id2asin.get(i), {}))
                for i in range(n)]


@gin.configurable
def p5_corpus(root: str = "dataset/amazon",
              split: str = "beauty") -> SequenceCorpus:
    raw = P5Raw(root, split)
    users, seqs = raw.sequences()
    num_items = 1 + max(max(s) for s in seqs)
    return SequenceCorpus(sequences=seqs,
                          user_ids=[u % 10000 for u in users],
                          timestamps=None, num_items=num_items)


@gin.configurable
class P5ItemDataset:
    """Item-embedding dataset for RQ-VAE over P5 metadata (95/5 split)."""

    def __init__(self, root: str = "dataset/amazon", split: str = "beauty",
                 train_test_split: str = "all",
                 encoder_model_name: str = "hashed", emb_dim: int = 768):
        raw = P5Raw(root, split)
        texts = raw.item_texts()
        if texts is None:
            raise FileNotFoundError(
                f"P5 datamaps/meta missing under {raw.dir}. "
                + P5_DOWNLOAD_HINT.format(path=raw.dir))
        enc = make_text_encoder(encoder_model_name=encoder_model_name,
                                dim=emb_dim)
        emb = enc.encode(texts, batch_size=64)
        if train_test_split != "all":
            rng = np.random.default_rng(42)
            is_train = rng.random(len(emb)) > 0.05
            emb = emb[is_train] if train_test_split == "train" else \
                emb[~is_train]
        self.embeddings = np.asarray(emb, np.float32)
        self.dim = self.embeddings.shape[-1]

    def __len__(self):
        return len(self.embeddings)

    def __getitem__(self, idx):
        return self.embeddings[idx]


def subsample_crop(sample: Sample, max_seq_len: int,
                   rng: np.random.Generator) -> Sample:
    """Random-crop window subsampling (reference p5_amazon.py:469-480):
    pick a random crop of the (history + target) sequence of length 3..L+1;
    the crop's last item becomes the target."""
    seq = list(sample.history) + [sample.target]
    if len(seq) <= 3:
        return sample
    start = int(rng.integers(0, max(1, len(seq) - 3)))
    end = int(rng.integers(start + 3,
                           min(start + max_seq_len + 1, len(seq)) + 1))
    crop = seq[start:end]
    return Sample(user_id=sample.user_id, history=crop[:-1],
                  target=crop[-1])
