"""Amazon-2014 ingest tests over synthetic on-disk gz fixtures."""

import gzip
import json
import os

import numpy as np
import pytest

from genrec_tpu.data.amazon import (AmazonItemDataset, AmazonRaw,
                                    amazon_corpus, format_item_text,
                                    parse_gzip_json)


@pytest.fixture
def amazon_dir(tmp_path):
    raw = tmp_path / "raw" / "beauty"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_items, n_users = 30, 12
    reviews = []
    for u in range(n_users):
        n = rng.integers(5, 9)
        items = rng.choice(n_items, size=n, replace=False)
        t0 = 1_300_000_000 + u
        for i, item in enumerate(items):
            reviews.append({"asin": f"A{item:03d}",
                            "reviewerID": f"U{u}",
                            "unixReviewTime": t0 + i * 1000,
                            "overall": 5.0})
    with gzip.open(raw / "reviews_Beauty_5.json.gz", "wt") as f:
        for r in reviews:
            f.write(json.dumps(r) + "\n")
    with gzip.open(raw / "meta_Beauty.json.gz", "wt") as f:
        for i in range(n_items):
            f.write(json.dumps({
                "asin": f"A{i:03d}", "title": f"Beauty product {i}",
                "price": 9.99, "brand": f"Brand{i % 5}",
                "categories": [["Beauty", f"Cat{i % 3}"]]}) + "\n")
        # one python-literal line (the reference tolerates these)
        f.write("{'asin': 'A000', 'title': 'dup literal'}\n")
    return str(tmp_path)


def test_parse_gzip_json_tolerates_literals(amazon_dir):
    raw = AmazonRaw(amazon_dir, "beauty")
    rows = list(parse_gzip_json(raw.meta_path))
    assert rows[-1]["title"] == "dup literal"


def test_item_dataset_builds_and_caches(amazon_dir):
    ds = AmazonItemDataset(root=amazon_dir, split="beauty",
                           encoder_model_name="hashed")
    assert ds.embeddings.shape[1] == 768
    n = len(ds)
    assert n > 0
    assert os.path.exists(ds.parquet_path)
    # second load hits the parquet cache (delete raw to prove it)
    os.remove(AmazonRaw(amazon_dir, "beauty").reviews_path)
    ds2 = AmazonItemDataset(root=amazon_dir, split="beauty")
    assert len(ds2) == n
    np.testing.assert_allclose(ds2.embeddings, ds.embeddings)


def test_item_dataset_split_fractions(amazon_dir):
    all_ds = AmazonItemDataset(root=amazon_dir, split="beauty")
    tr = AmazonItemDataset(root=amazon_dir, split="beauty",
                           train_test_split="train")
    ev = AmazonItemDataset(root=amazon_dir, split="beauty",
                           train_test_split="eval")
    assert len(tr) + len(ev) == len(all_ds)


def test_corpus_and_text_format(amazon_dir):
    corpus = amazon_corpus(root=amazon_dir, split="beauty", min_seq_len=5)
    assert len(corpus.sequences) > 0
    for seq, ts in zip(corpus.sequences, corpus.timestamps):
        assert len(seq) >= 5
        assert ts == sorted(ts)
    text = format_item_text({"title": "X", "price": 1.5, "brand": "B"})
    assert "'title':X" in text and "'brand':B" in text


def test_unknown_split_rejected(amazon_dir):
    with pytest.raises(ValueError, match="Unknown split"):
        AmazonRaw(amazon_dir, "nonexistent")


def test_e2e_sasrec_on_amazon_fixture(amazon_dir, tmp_path):
    """The Amazon dataset path drives the SASRec trainer end to end."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.sasrec_trainer import train
    gin.parse_config(f"""
        train.dataset_type = "amazon"
        train.epochs = 1
        train.batch_size = 16
        train.max_seq_len = 10
        train.embed_dim = 16
        train.num_blocks = 1
        train.ffn_dim = 32
        train.eval_batch_size = 16
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.dataset_folder", amazon_dir)
    gin.bind_parameter("train.save_dir_root", str(tmp_path / "out"))
    metrics = train()
    assert "Recall@10" in metrics
