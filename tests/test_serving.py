"""Serving-layer tests: recommenders over trained checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.models.sasrec import SASRec
from genrec_tpu.models.tiger import Tiger
from genrec_tpu.serving import SASRecRecommender, TigerRecommender


def test_sasrec_recommender_roundtrip(tmp_path):
    from genrec_tpu.core import CheckpointManager
    model = SASRec(num_items=30, max_seq_len=8, embed_dim=16, num_heads=2,
                   num_blocks=1, ffn_dim=32, dropout=0.0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy)["params"]
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(1, jax.tree_util.tree_map(np.asarray, params))

    rec = SASRecRecommender.from_checkpoint(str(tmp_path / "ckpt"), model)
    out = rec.recommend([[0, 1, 2], [5]], k=5)
    assert out.shape == (2, 5)
    assert out.min() >= 0 and out.max() < 30       # 0-based, pad excluded
    # ragged histories and >max_len histories both work
    out2 = rec.recommend([list(range(20))], k=3)
    assert out2.shape == (1, 3)


def test_tiger_recommender_returns_catalog_items():
    rng = np.random.default_rng(0)
    model = Tiger(embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4,
                  n_layers=2, num_item_embeddings=8, num_user_embeddings=50,
                  sem_id_dim=3)
    n_items = 20
    sem_ids = rng.integers(0, 8, (n_items, 3)).astype(np.int32)
    C = 3
    dummy = dict(
        user_ids=jnp.zeros((1,), jnp.int32),
        sem_ids=jnp.zeros((1, C), jnp.int32),
        token_type_ids=jnp.arange(C, dtype=jnp.int32)[None],
        sem_ids_fut=jnp.zeros((1, C), jnp.int32),
        token_type_ids_fut=jnp.arange(C, dtype=jnp.int32)[None],
        seq_mask=jnp.ones((1, C), bool))
    params = model.init({"params": jax.random.PRNGKey(0)}, **dummy)["params"]

    rec = TigerRecommender(model, params, sem_ids, num_beams=8,
                           max_seq_len=5)
    results = rec.recommend([1, 2], [[0, 3, 5], [7, 2]], k=5)
    assert len(results) == 2
    for row in results:
        assert len(row) <= 5
        for item in row:
            assert 0 <= item < n_items
        assert len(set(row)) == len(row)  # no duplicate items


def test_lcrec_recommender_returns_catalog_items():
    from genrec_tpu.models.lcrec import LCRec
    from genrec_tpu.serving import LCRecRecommender

    C, K = 3, 8
    lcrec = LCRec(d_model=32, n_layers=1, n_heads=4, n_kv_heads=2,
                  ff_dim=64, base_vocab=200, max_len=288,
                  num_codebooks=C, codebook_size=K)
    params = lcrec.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sem_ids = rng.integers(0, K, (20, C)).astype(np.int32)

    rec = LCRecRecommender(lcrec, params, sem_ids, num_beams=4,
                           prompt_len=256)
    rows = rec.recommend([[0, 1, 2], [3, 4]], k=3)
    assert len(rows) == 2
    for row in rows:
        assert len(row) <= 3
        for item in row:
            assert 0 <= item < 20       # trie keeps us in the catalog


def test_recommender_request_bucketing():
    """Odd request sizes round up to a power-of-two bucket: one compile
    serves every size in the bucket, rows are sliced back exactly."""
    model = SASRec(num_items=30, max_seq_len=8, embed_dim=16, num_heads=2,
                   num_blocks=1, ffn_dim=32, dropout=0.0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy)["params"]
    rec = SASRecRecommender(model, params)
    out4 = rec.recommend([[0, 1], [2], [3, 4, 5], [6]], k=5)
    n_compiles = rec._fn._cache_size()
    out3 = rec.recommend([[0, 1], [2], [3, 4, 5]], k=5)
    assert rec._fn._cache_size() == n_compiles  # same bucket: no recompile
    assert out3.shape == (3, 5) and out4.shape == (4, 5)
    np.testing.assert_array_equal(out3, out4[:3])


def test_cobra_recommender_returns_catalog_items():
    from genrec_tpu.models.cobra import Cobra
    from genrec_tpu.serving import CobraRecommender

    rng = np.random.default_rng(0)
    n_items, C, K = 30, 3, 8
    model = Cobra(encoder_n_layers=1, encoder_hidden_dim=32,
                  encoder_num_heads=4, encoder_vocab_size=100,
                  id_vocab_size=K, n_codebooks=C, d_model=32,
                  decoder_n_layers=1, decoder_num_heads=4,
                  decoder_dropout=0.0)
    sem_ids = rng.integers(0, K, (n_items, C)).astype(np.int32)
    item_tokens = rng.integers(1, 100, (n_items, 6)).astype(np.int32)
    ids = jnp.asarray(rng.integers(0, K, (2, 4 * C)), jnp.int32)
    toks = jnp.asarray(rng.integers(1, 100, (2, 4, 6)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        toks)["params"]

    rec = CobraRecommender(model, params, sem_ids, item_tokens,
                           max_items=4, n_beam=8)
    out = rec.recommend([[0, 1, 2], [5, 7]], k=5)
    assert out.shape == (2, 5)
    assert out.min() >= 0 and out.max() < n_items


def test_notellm_embedder_and_retrieval():
    from genrec_tpu.models.notellm import Query2Embedding
    from genrec_tpu.serving import NoteLLMEmbedder

    model = Query2Embedding(vocab_size=200, emb_token_id=5, d_model=32,
                            n_layers=1, n_heads=4, n_kv_heads=2, ff_dim=64,
                            max_len=32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(6, 200, (4, 12)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]

    emb = NoteLLMEmbedder(model, params)
    rows = [[7, 8, 9, 5], [10, 11, 5], [12, 5]]   # [EMB]-terminated
    e = emb.embed(rows, max_len=8)
    assert e.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)
    # retrieval against itself: each query's nearest doc is itself
    idx = emb.retrieve(rows, e, k=1, max_len=8)
    np.testing.assert_array_equal(idx[:, 0], np.arange(3))
