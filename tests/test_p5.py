"""P5 pipeline tests (synthetic on-disk fixtures, no downloads)."""

import gzip
import json
import os

import numpy as np
import pytest

from genrec_tpu.data.p5_amazon import (P5ItemDataset, P5Raw, p5_corpus,
                                       subsample_crop)
from genrec_tpu.data.sequences import Sample


@pytest.fixture
def p5_dir(tmp_path):
    d = tmp_path / "raw" / "beauty"
    d.mkdir(parents=True)
    lines = ["1 1 2 3 4 5", "2 3 4 5 6 7 8", "3 2 5 1 9 10"]
    (d / "sequential_data.txt").write_text("\n".join(lines) + "\n")
    datamaps = {"item2id": {f"ASIN{i}": str(i) for i in range(1, 11)},
                "user2id": {}}
    (d / "datamaps.json").write_text(json.dumps(datamaps))
    metas = [{"asin": f"ASIN{i}", "title": f"Product number {i}",
              "brand": "B"} for i in range(1, 11)]
    with gzip.open(d / "meta.json.gz", "wt") as f:
        for m in metas:
            f.write(json.dumps(m) + "\n")
    return str(tmp_path)


def test_p5_corpus_parses_and_remaps(p5_dir):
    corpus = p5_corpus(root=p5_dir, split="beauty")
    assert len(corpus.sequences) == 3
    assert corpus.sequences[0] == [0, 1, 2, 3, 4]   # 1-based -> 0-based
    assert corpus.num_items == 10
    # LOO splits behave like the shared corpus contract
    test = corpus.generate_samples("test")
    assert test[0].target == 4


def test_p5_missing_data_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="Provision the P5"):
        p5_corpus(root=str(tmp_path), split="beauty")


def test_p5_item_dataset_embeddings(p5_dir):
    ds = P5ItemDataset(root=p5_dir, split="beauty", emb_dim=64)
    assert ds.embeddings.shape == (10, 64)
    np.testing.assert_allclose(np.linalg.norm(ds.embeddings, axis=1), 1.0,
                               rtol=1e-4)
    ds_train = P5ItemDataset(root=p5_dir, split="beauty",
                             train_test_split="train", emb_dim=64)
    assert len(ds_train) <= 10


def test_subsample_crop_properties():
    rng = np.random.default_rng(0)
    s = Sample(user_id=1, history=list(range(30)), target=30)
    for _ in range(50):
        c = subsample_crop(s, max_seq_len=10, rng=rng)
        full = c.history + [c.target]
        assert 3 <= len(full) <= 11
        # crop is a contiguous subsequence of the original
        start = full[0]
        assert full == list(range(start, start + len(full)))
    # short sequences returned unchanged
    short = Sample(user_id=1, history=[0, 1], target=2)
    assert subsample_crop(short, 10, rng) is short


def test_tiger_trainer_p5_end_to_end(p5_dir, tmp_path, monkeypatch):
    """dataset_type='p5' drives the TIGER trainer end-to-end (VERDICT
    round-1 task #7): corpus + random-crop subsampling + trie eval."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers import tiger_trainer
    import numpy as np

    sem_ids = np.random.default_rng(0).integers(0, 8, (10, 3)).astype(
        np.int32)
    out = tiger_trainer.train(
        epochs=1, batch_size=8, embedding_dim=8, attn_dim=16, num_heads=2,
        n_layers=1, num_item_embeddings=8, sem_id_dim=3, max_seq_len=6,
        dataset_type="p5", dataset_folder=p5_dir, split="beauty",
        subsample=True, sem_ids_table=sem_ids, num_beams=4,
        do_eval=True, eval_valid_every_epoch=1,
        save_dir_root=str(tmp_path / "out"), save_every_epoch=100,
        num_warmup_steps=1)
    assert "Recall@10" in out


def test_loader_transform_applies_per_epoch():
    from genrec_tpu.data.loader import Loader
    from genrec_tpu.data.sequences import Sample
    samples = [Sample(user_id=i, history=list(range(12)), target=12)
               for i in range(4)]
    seen = []

    def transform(s, rng):
        seen.append(len(s.history))
        return Sample(user_id=s.user_id,
                      history=s.history[:int(rng.integers(3, 9))],
                      target=s.target)

    def batch_fn(batch):
        return {"h": np.asarray([len(s.history) for s in batch]),
                "valid": np.ones(len(batch), bool)}

    loader = Loader(samples, 2, batch_fn, shuffle=True, seed=0,
                    transform=transform)
    b1 = [b["h"].copy() for b in loader]
    b2 = [b["h"].copy() for b in loader]
    assert len(seen) == 8
    # epoch-dependent rng: crops differ between epochs (with high prob.)
    assert sorted(np.concatenate(b1).tolist()) != \
        sorted(np.concatenate(b2).tolist())
