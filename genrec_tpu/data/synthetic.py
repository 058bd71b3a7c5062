"""Synthetic catalog + interaction generator for offline dev, tests, bench.

The reference has no offline data path — every dataset downloads Amazon-2014
from SNAP (``/root/reference/genrec/data/amazon.py:24-66``). This environment
has zero egress, so this module provides a learnable stand-in with the same
statistical shape: items live in soft clusters with dense "text" embeddings,
and user sequences are cluster-biased Markov walks, so sequence models can
beat chance and RQ-VAE codes align with clusters.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from genrec_tpu.configlib import gin
from .sequences import SequenceCorpus, build_corpus


@dataclass
class SyntheticCatalog:
    embeddings: np.ndarray   # (N, D) float32, L2-normalized
    clusters: np.ndarray     # (N,) int32


def make_catalog(n_items: int = 2000, emb_dim: int = 768,
                 n_clusters: int = 32, seed: int = 0) -> SyntheticCatalog:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, emb_dim)).astype(np.float32)
    # cluster assignment from its own stream so it is invariant to emb_dim:
    # the RQ-VAE catalog (768-d) and sequence corpora (any dim) must agree on
    # which cluster each item belongs to.
    clusters = np.random.default_rng((seed, 1)).integers(
        0, n_clusters, size=n_items)
    emb = centers[clusters] + 0.3 * rng.standard_normal(
        (n_items, emb_dim)).astype(np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return SyntheticCatalog(embeddings=emb.astype(np.float32),
                            clusters=clusters.astype(np.int32))


def make_interactions(catalog: SyntheticCatalog, n_users: int = 500,
                      min_len: int = 5, max_len: int = 30,
                      stay_prob: float = 0.8, seed: int = 1) -> SequenceCorpus:
    """Cluster-biased Markov walks over the catalog."""
    rng = np.random.default_rng(seed)
    n_clusters = int(catalog.clusters.max()) + 1
    by_cluster = [np.flatnonzero(catalog.clusters == c)
                  for c in range(n_clusters)]
    by_cluster = [b if len(b) else np.arange(len(catalog.clusters))
                  for b in by_cluster]
    events = {}
    for u in range(n_users):
        length = int(rng.integers(min_len, max_len + 1))
        c = int(rng.integers(0, n_clusters))
        t0 = int(rng.integers(1_300_000_000, 1_400_000_000))
        seq = []
        for i in range(length):
            if rng.random() > stay_prob:
                c = int(rng.integers(0, n_clusters))
            item = int(rng.choice(by_cluster[c]))
            seq.append((t0 + i * 86_400, item))
        events[f"user_{u}"] = seq
    return build_corpus(events, min_seq_len=min_len)


@gin.configurable
class SyntheticItemDataset:
    """Item-embedding dataset for RQ-VAE training (AmazonItemDataset shape).

    Mirrors the reference's 95/5 random item split with a fixed seed
    (``amazon.py:221-233``).
    """

    def __init__(self, n_items: int = 2000, emb_dim: int = 768,
                 n_clusters: int = 32, train_test_split: str = "all",
                 seed: int = 0):
        catalog = make_catalog(n_items, emb_dim, n_clusters, seed)
        self.catalog = catalog
        self.dim = emb_dim
        emb = catalog.embeddings
        if train_test_split != "all":
            split_rng = np.random.default_rng(42)
            is_train = split_rng.random(len(emb)) > 0.05
            emb = emb[is_train] if train_test_split == "train" else emb[~is_train]
        self.embeddings = emb

    def __len__(self):
        return len(self.embeddings)

    def __getitem__(self, idx):
        return self.embeddings[idx]


@gin.configurable
def synthetic_corpus(n_items: int = 2000, emb_dim: int = 64,
                     n_clusters: int = 32, n_users: int = 500,
                     min_len: int = 5, max_len: int = 30,
                     seed: int = 0) -> tuple[SyntheticCatalog, SequenceCorpus]:
    catalog = make_catalog(n_items, emb_dim, n_clusters, seed)
    corpus = make_interactions(catalog, n_users, min_len, max_len,
                               seed=seed + 1)
    corpus.num_items = n_items
    return catalog, corpus
