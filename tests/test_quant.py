"""Int8 weight-only quantization: error bounds + quantized serving paths."""

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.ops.quant import (dequantize_int8, dequantize_tree,
                                  is_quantized, quantize_int8,
                                  quantize_tree, tree_bytes)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.float32)
    node = quantize_int8(w)
    back = dequantize_int8(node)
    # symmetric max-abs per column: error ≤ scale/2 + rounding slack
    bound = np.asarray(node["int8_scale"])[0] * 0.5 + 1e-7
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= bound[None, :]).all()
    assert node["int8_q"].dtype == jnp.int8


def test_quantize_tree_selectivity_and_size():
    rng = np.random.default_rng(1)
    params = {
        "wte": jnp.asarray(rng.normal(size=(1024, 128)), jnp.float32),
        "norm": {"scale": jnp.ones((128,), jnp.float32)},
        "tiny": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
    }
    q = quantize_tree(params, min_size=2 ** 16)
    assert is_quantized(q["wte"])
    assert not is_quantized(q["tiny"])          # below min_size: exact
    np.testing.assert_array_equal(q["norm"]["scale"],
                                  params["norm"]["scale"])
    # int8 + fp32 scales ≈ 1/4 the fp32 bytes for the quantized table
    assert tree_bytes(q) < 0.3 * tree_bytes(params)
    back = dequantize_tree(q)
    assert back["wte"].shape == params["wte"].shape
    np.testing.assert_allclose(np.asarray(back["wte"]),
                               np.asarray(params["wte"]), atol=0.05)


def test_quantized_model_logits_close():
    from genrec_tpu.models.sasrec import SASRec
    model = SASRec(num_items=2000, max_seq_len=16, embed_dim=64,
                   num_heads=2, num_blocks=1, ffn_dim=128, dropout=0.0)
    dummy = jnp.zeros((1, 16), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy)["params"]
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 2000, (4, 16)), jnp.int32)
    ref = model.apply({"params": params}, ids, deterministic=True).logits
    qp = dequantize_tree(quantize_tree(params, min_size=2 ** 12))
    out = model.apply({"params": qp}, ids, deterministic=True).logits
    ref, out = np.asarray(ref), np.asarray(out)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / denom < 0.05


def test_sasrec_recommender_quantized():
    from genrec_tpu.serving import SASRecRecommender
    from genrec_tpu.models.sasrec import SASRec
    model = SASRec(num_items=2048, max_seq_len=8, embed_dim=64, num_heads=2,
                   num_blocks=1, ffn_dim=64, dropout=0.0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy)["params"]
    rec = SASRecRecommender(model, params, quantize_int8=True)
    out = rec.recommend([[0, 1, 2], [5]], k=5)
    assert out.shape == (2, 5)
    assert out.min() >= 0 and out.max() < 2048
    # the stored tree really is int8 (serving memory halves vs bf16)
    from genrec_tpu.ops.quant import Q_KEY
    leaves = jax.tree_util.tree_leaves(rec.params)
    assert any(leaf.dtype == jnp.int8 for leaf in leaves)


def test_lcrec_recommender_quantized():
    from genrec_tpu.models.lcrec import LCRec
    from genrec_tpu.serving import LCRecRecommender

    C, K = 3, 8
    lcrec = LCRec(d_model=32, n_layers=1, n_heads=4, n_kv_heads=2,
                  ff_dim=64, base_vocab=4000, max_len=288,
                  num_codebooks=C, codebook_size=K)
    params = lcrec.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sem_ids = rng.integers(0, K, (20, C)).astype(np.int32)
    rec = LCRecRecommender(lcrec, params, sem_ids, num_beams=4,
                           prompt_len=128, quantize_int8=True)
    # the token table is actually int8 in the stored tree
    leaves = jax.tree_util.tree_leaves(rec.params)
    assert any(leaf.dtype == jnp.int8 for leaf in leaves)
    rows = rec.recommend([[0, 1, 2], [3, 4]], k=3)
    assert len(rows) == 2
    for row in rows:
        for item in row:
            assert 0 <= item < 20
