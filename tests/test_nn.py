"""Unit tests for genrec_tpu.nn building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu import nn as gnn


def init_and_apply(module, *args, rngs=None, **kwargs):
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = module.init(rngs, *args, **kwargs)
    return variables, module.apply(variables, *args, **kwargs)


def test_rmsnorm_matches_manual():
    x = np.random.default_rng(0).normal(size=(2, 5, 8)).astype(np.float32)
    mod = gnn.RMSNorm(dim=8)
    _, out = init_and_apply(mod, jnp.asarray(x))
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_t5layernorm_fp32_stats():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 8)),
                    dtype=jnp.bfloat16)
    mod = gnn.T5LayerNorm(dim=8)
    _, out = init_and_apply(mod, x)
    assert out.dtype == jnp.bfloat16


def test_swish_layernorm():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 8)),
                    dtype=jnp.float32)
    mod = gnn.SwishLayerNorm(dim=8)
    _, out = init_and_apply(mod, x)
    assert out.shape == (4, 8)
    # silu(LN(x)) is bounded below by ~-0.2785
    assert float(jnp.min(out)) > -0.3


def test_sem_id_embedding_offsets_and_padding():
    K, C, D = 16, 3, 4
    mod = gnn.SemIdEmbedding(num_embeddings=K, sem_ids_dim=C,
                             embeddings_dim=D)
    ids = jnp.array([[0, 0, 0, K * C - K * (C - 1)]])  # last entry: id 16? no:
    ids = jnp.array([[0, 0, 0]])
    types = jnp.array([[0, 1, 2]])
    variables, out = init_and_apply(mod, ids, types)
    table = variables["params"]["embedding"]
    # same raw id 0 at different levels hits different rows
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(table[0]))
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(table[K]))
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(table[2 * K]))
    # padding: token_type*K + id == padding_idx -> zero vector
    pad_ids = jnp.array([[0]])
    pad_types = jnp.array([[C]])  # C*K == padding_idx
    out_pad = mod.apply(variables, pad_ids, pad_types)
    np.testing.assert_allclose(np.asarray(out_pad), 0.0)


def test_user_id_embedding_hashes():
    mod = gnn.UserIdEmbedding(num_embeddings=10, embeddings_dim=4)
    variables, out = init_and_apply(mod, jnp.array([[3, 13, 23]]))
    o = np.asarray(out)
    np.testing.assert_allclose(o[0, 0], o[0, 1])
    np.testing.assert_allclose(o[0, 0], o[0, 2])


def test_mlp_shapes_and_norm():
    mod = gnn.MLP(hidden_dims=[32, 16, 8], normalize_out=True)
    x = jnp.ones((4, 12))
    _, out = init_and_apply(mod, x)
    assert out.shape == (4, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               rtol=1e-5)


def test_relative_position_bucket_matches_hf_t5():
    """Golden test against HF T5's public bucket function (the reference's
    own implementation mirrors it; /root/reference/genrec/modules/transformer.py:13-41)."""
    torch = pytest.importorskip("torch")
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5

    q, k = 24, 24
    ctx = np.arange(q)[:, None]
    mem = np.arange(k)[None, :]
    rp = mem - ctx
    ours = np.asarray(gnn.relative_position_bucket(
        jnp.asarray(rp), num_buckets=32, max_distance=128, bidirectional=True))
    hf = HFT5._relative_position_bucket(
        torch.as_tensor(rp), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    # The reference adds sign*num_buckets for negative rel-pos while HF uses
    # (rp > 0); both partition the same way up to the bucket labelling for
    # the two halves. Compare the partition structure, not raw labels:
    # positions bucketed together by HF must be bucketed together by ours.
    for table in (ours, hf):
        assert table.min() >= 0 and table.max() < 32
    pairs = {}
    for i in range(q):
        for j in range(k):
            pairs.setdefault(hf[i, j], set()).add(ours[i, j])
    for hf_bucket, our_buckets in pairs.items():
        assert len(our_buckets) == 1, (
            f"HF bucket {hf_bucket} maps to multiple of ours: {our_buckets}")


def test_t5_attention_shapes_and_padding_mask():
    mod = gnn.T5Attention(d_model=32, n_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 32)),
                    dtype=jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    kpm = jnp.zeros((2, 6), bool).at[:, -2:].set(True)
    out = mod.apply(variables, x, key_padding_mask=kpm)
    assert out.shape == (2, 6, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_decoder_causality():
    """Changing a future target token must not affect earlier decoder outputs."""
    mod = gnn.TransformerEncoderDecoder(
        d_model=32, nhead=4, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=64, dropout=0.0)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(1, 5, 32)), dtype=jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(1, 4, 32)), dtype=jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, src, tgt)
    out1 = mod.apply(variables, src, tgt)
    tgt2 = tgt.at[0, -1].set(99.0)
    out2 = mod.apply(variables, src, tgt2)
    np.testing.assert_allclose(np.asarray(out1[0, :-1]),
                               np.asarray(out2[0, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[0, -1]), np.asarray(out2[0, -1]))


def test_encoder_padding_invariance():
    """Padded source positions must not change non-pad encoder outputs."""
    mod = gnn.TransformerEncoder(dim=32, depth=2, num_heads=4, dropout=0.0)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(1, 6, 32)), dtype=jnp.float32)
    kpm = jnp.zeros((1, 6), bool).at[:, 4:].set(True)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, src,
                         key_padding_mask=kpm)
    out1 = mod.apply(variables, src, key_padding_mask=kpm)
    src2 = src.at[0, 4:].set(123.0)
    out2 = mod.apply(variables, src2, key_padding_mask=kpm)
    np.testing.assert_allclose(np.asarray(out1[0, :4]),
                               np.asarray(out2[0, :4]), atol=1e-4)


def test_transformer_works_in_bf16():
    mod = gnn.TransformerEncoderDecoder(
        d_model=32, nhead=4, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=64, dropout=0.0, dtype=jnp.bfloat16)
    src = jnp.ones((2, 3, 32), jnp.bfloat16)
    tgt = jnp.ones((2, 2, 32), jnp.bfloat16)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, src, tgt)
    out = mod.apply(variables, src, tgt)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_pretrained_text_encoder_with_local_model(tmp_path):
    """Exercise the pretrained-encoder wrapper (sentence-t5/ernie/bge
    parity) against a locally-constructed tiny BERT — the hub path the
    zero-egress environment can't reach, minus the download."""
    pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "item", "shiny", "red", "blue", "product", "##s"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(vocab_file))
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=64)
    import torch
    torch.manual_seed(0)
    model = BertModel(cfg)
    model_dir = tmp_path / "bert"
    model.save_pretrained(str(model_dir))
    tok.save_pretrained(str(model_dir))

    from genrec_tpu.nn.encoder import (PretrainedTextEncoder, bge_encoder,
                                       ernie_encoder, sentence_t5_encoder)
    texts = ["the shiny red item", "blue products", "the product"]
    for factory in (sentence_t5_encoder, ernie_encoder, bge_encoder):
        enc = factory(str(model_dir))
        emb = enc.encode(texts, batch_size=2)
        assert emb.shape == (3, 32)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0,
                                   rtol=1e-5)
    # mean vs cls pooling genuinely differ
    e_mean = sentence_t5_encoder(str(model_dir)).encode(texts)
    e_cls = ernie_encoder(str(model_dir)).encode(texts)
    assert np.abs(e_mean - e_cls).max() > 1e-3
    # missing model raises the clear offline error
    with pytest.raises(FileNotFoundError, match="not cached"):
        PretrainedTextEncoder(str(tmp_path / "nope"))
