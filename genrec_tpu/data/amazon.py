"""Amazon-2014 5-core ingest: reviews/meta parsing, text-embedding cache.

Parity target: ``/root/reference/genrec/data/amazon.py``: dataset URL table
(:24-43), lenient gzip-JSON parsing (:69-80), item-text formatting and
SentenceTransformer embedding with a parquet cache (:156-219), the 95/5
item-level split seeded with 42 (:221-233), and user-sequence construction
(time-sorted, ≥5 interactions; :355-390).

Differences by design:
* Download is **gated** (``GENREC_ALLOW_DOWNLOAD=1``) — this environment has
  zero egress; raw files can also be provisioned out-of-band into
  ``<root>/raw/<split>/``.
* Item ids are 0-based everywhere (the reference mixes a 1-based map in
  ``AmazonItemDataset`` with a 0-based map in ``AmazonSeqDataset``; both
  yield the same embedding-row order, which is what matters).
* The text encoder is pluggable with an offline fallback
  (:mod:`genrec_tpu.data.text_encoder`).
"""

from __future__ import annotations

import gzip
import json
import logging
import os
from typing import Dict, List

import numpy as np

from genrec_tpu.configlib import gin
from .sequences import SequenceCorpus, build_corpus
from .text_encoder import make_text_encoder

logger = logging.getLogger(__name__)

AMAZON_REVIEW_BASE_URL = (
    "http://snap.stanford.edu/data/amazon/productGraph/categoryFiles")

DATASET_CONFIGS = {
    "beauty": {"reviews": "reviews_Beauty_5.json.gz",
               "meta": "meta_Beauty.json.gz"},
    "sports": {"reviews": "reviews_Sports_and_Outdoors_5.json.gz",
               "meta": "meta_Sports_and_Outdoors.json.gz"},
    "toys": {"reviews": "reviews_Toys_and_Games_5.json.gz",
             "meta": "meta_Toys_and_Games.json.gz"},
    "clothing": {"reviews": "reviews_Clothing_Shoes_and_Jewelry_5.json.gz",
                 "meta": "meta_Clothing_Shoes_and_Jewelry.json.gz"},
}


def parse_gzip_json(path: str):
    """Yield records from a gzipped JSON-lines file, tolerating malformed
    lines (some Amazon meta rows are Python-literal dicts, not JSON)."""
    import ast
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                try:
                    yield ast.literal_eval(line)
                except (ValueError, SyntaxError):
                    continue


def download_file(url: str, dest_path: str) -> None:
    if os.path.exists(dest_path):
        return
    if os.environ.get("GENREC_ALLOW_DOWNLOAD") != "1":
        raise FileNotFoundError(
            f"{dest_path} is missing and downloads are disabled "
            f"(set GENREC_ALLOW_DOWNLOAD=1, or provision the file manually "
            f"from {url}).")
    import urllib.request
    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    logger.info("Downloading %s -> %s", url, dest_path)
    with urllib.request.urlopen(url) as resp, open(dest_path, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)


def format_item_text(info: dict) -> str:
    """Item metadata → embedding text (reference field order, amazon.py:199-205)."""
    return (f"'title':{info.get('title', '')}\n"
            f" 'price':{info.get('price', '')}\n"
            f" 'salesRank':{info.get('salesRank', '')}\n"
            f" 'brand':{info.get('brand', '')}\n"
            f" 'categories':{info.get('categories', '')}")


class AmazonRaw:
    """Shared raw-file access for one category split."""

    def __init__(self, root: str, split: str):
        split = split.lower()
        if split not in DATASET_CONFIGS:
            raise ValueError(
                f"Unknown split: {split}. Available: {list(DATASET_CONFIGS)}")
        self.root = root
        self.split = split
        self.raw_dir = os.path.join(root, "raw", split)
        self.processed_dir = os.path.join(root, "processed", split)
        cfg = DATASET_CONFIGS[split]
        self.reviews_path = os.path.join(self.raw_dir, cfg["reviews"])
        self.meta_path = os.path.join(self.raw_dir, cfg["meta"])

    def ensure_downloaded(self) -> None:
        cfg = DATASET_CONFIGS[self.split]
        for kind in ("reviews", "meta"):
            download_file(f"{AMAZON_REVIEW_BASE_URL}/{cfg[kind]}",
                          os.path.join(self.raw_dir, cfg[kind]))

    def item_id_mapping(self) -> Dict[str, int]:
        """asin → 0-based item id, in first-seen review order."""
        mapping: Dict[str, int] = {}
        for review in parse_gzip_json(self.reviews_path):
            asin = review.get("asin")
            if asin and asin not in mapping:
                mapping[asin] = len(mapping)
        return mapping

    def item_texts(self, mapping: Dict[str, int]) -> List[str]:
        infos: Dict[int, dict] = {}
        for meta in parse_gzip_json(self.meta_path):
            asin = meta.get("asin")
            if asin in mapping:
                infos[mapping[asin]] = {
                    "title": meta.get("title"),
                    "price": meta.get("price"),
                    "salesRank": meta.get("salesRank"),
                    "brand": meta.get("brand"),
                    "categories": meta.get("categories"),
                }
        return [format_item_text(infos.get(i, {}))
                for i in range(len(mapping))]

    def user_events(self) -> Dict[str, List[tuple]]:
        events: Dict[str, List[tuple]] = {}
        mapping: Dict[str, int] = {}
        for review in parse_gzip_json(self.reviews_path):
            asin = review.get("asin")
            uid = review.get("reviewerID")
            ts = review.get("unixReviewTime", 0)
            if asin and uid:
                if asin not in mapping:
                    mapping[asin] = len(mapping)
                events.setdefault(uid, []).append((ts, mapping[asin]))
        return events


@gin.configurable
class AmazonItemDataset:
    """Item text-embedding dataset for RQ-VAE training, with parquet cache."""

    def __init__(self, root: str = "dataset/amazon", split: str = "beauty",
                 train_test_split: str = "all",
                 encoder_model_name: str = "hashed",
                 force_regenerate: bool = False):
        self.raw = AmazonRaw(root, split)
        self.split = self.raw.split
        self.parquet_path = os.path.join(self.raw.processed_dir,
                                         "item_emb.parquet")
        if os.path.exists(self.parquet_path) and not force_regenerate:
            self._load_cached()
        else:
            self._generate(encoder_model_name)
        self._apply_split(train_test_split)

    def _load_cached(self) -> None:
        import pandas as pd
        df = pd.read_parquet(self.parquet_path)
        self.embeddings = np.stack(df["embedding"].to_numpy()).astype(
            np.float32)
        self.dim = self.embeddings.shape[-1]

    def _generate(self, encoder_model_name: str) -> None:
        import pandas as pd
        self.raw.ensure_downloaded()
        mapping = self.raw.item_id_mapping()
        texts = self.raw.item_texts(mapping)
        encoder = make_text_encoder(encoder_model_name=encoder_model_name)
        emb = encoder.encode(texts, batch_size=64)
        os.makedirs(self.raw.processed_dir, exist_ok=True)
        pd.DataFrame({
            "ItemID": np.arange(len(texts)),
            "embedding": [e.tolist() for e in emb],
        }).to_parquet(self.parquet_path, index=False)
        self.embeddings = np.asarray(emb, dtype=np.float32)
        self.dim = self.embeddings.shape[-1]

    def _apply_split(self, train_test_split: str) -> None:
        if train_test_split == "all":
            return
        # reference seeds torch.rand with 42; we keep the same 95/5 protocol
        # with numpy (the exact membership differs, the statistics don't).
        rng = np.random.default_rng(42)
        is_train = rng.random(len(self.embeddings)) > 0.05
        if train_test_split == "train":
            self.embeddings = self.embeddings[is_train]
        elif train_test_split == "eval":
            self.embeddings = self.embeddings[~is_train]
        else:
            raise ValueError(f"Unknown train_test_split: {train_test_split}")

    def __len__(self):
        return len(self.embeddings)

    def __getitem__(self, idx):
        return self.embeddings[idx]


@gin.configurable
def amazon_corpus(root: str = "dataset/amazon", split: str = "beauty",
                  min_seq_len: int = 5,
                  num_user_buckets: int = 10000) -> SequenceCorpus:
    """User-sequence corpus for sequential models (reference amazon.py:355-390)."""
    raw = AmazonRaw(root, split)
    raw.ensure_downloaded()
    return build_corpus(raw.user_events(), min_seq_len=min_seq_len,
                        num_user_buckets=num_user_buckets)
