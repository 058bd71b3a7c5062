"""Fused chunked linear+cross-entropy vs the naive logits path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.ops.fused_ce import fused_linear_cross_entropy


def _naive(x, w, labels, vocab_major):
    logits = (x @ (w.T if vocab_major else w)).astype(jnp.float32)
    keep = labels != -100
    safe = jnp.where(keep, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tl = jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return -(tl * keep).sum() / jnp.maximum(keep.sum(), 1)


@pytest.mark.parametrize("vocab_major", [True, False])
@pytest.mark.parametrize("V,chunk", [(50, 16), (64, 16), (37, 128)])
def test_loss_and_grads_match_naive(vocab_major, V, chunk):
    rng = np.random.default_rng(0)
    N, D = 13, 32
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(V, D) if vocab_major else (D, V)) * 0.3,
                    jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    labels = labels.at[:3].set(-100)

    fused = jax.jit(lambda x, w: fused_linear_cross_entropy(
        x, w, labels, -100, chunk, vocab_major))
    naive = jax.jit(lambda x, w: _naive(x, w, labels, vocab_major))

    np.testing.assert_allclose(float(fused(x, w)), float(naive(x, w)),
                               rtol=1e-6)
    gf = jax.grad(lambda a, b: fused_linear_cross_entropy(
        a, b, labels, -100, chunk, vocab_major), argnums=(0, 1))(x, w)
    gn = jax.grad(_naive, argnums=(0, 1))(x, w, labels, vocab_major)
    for a, b, name in zip(gf, gn, ("dx", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, err_msg=name)


def test_all_ignored_is_zero():
    x = jnp.ones((4, 8), jnp.float32)
    w = jnp.ones((10, 8), jnp.float32)
    labels = jnp.full((4,), -100, jnp.int32)
    loss = fused_linear_cross_entropy(x, w, labels, -100, 16, True)
    assert float(loss) == 0.0
    dx = jax.grad(lambda a: fused_linear_cross_entropy(
        a, w, labels, -100, 16, True))(x)
    assert not np.any(np.asarray(dx))


def test_causal_lm_fused_matches_naive():
    from genrec_tpu.models.llm import CausalLM
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 50, (2, 9)), jnp.int32)
    labels = jnp.asarray(ids).at[:, :4].set(-100)
    for tie in (True, False):
        kw = dict(vocab_size=50, d_model=32, n_layers=1, n_heads=4,
                  n_kv_heads=2, ff_dim=64, max_len=16, tie_embeddings=tie)
        fused_m = CausalLM(**kw, fused_ce=True)
        naive_m = CausalLM(**kw, fused_ce=False)
        params = naive_m.init({"params": jax.random.PRNGKey(0)},
                              ids)["params"]
        lf = fused_m.apply({"params": params}, ids, labels=labels).loss
        ln = naive_m.apply({"params": params}, ids, labels=labels).loss
        np.testing.assert_allclose(float(lf), float(ln), rtol=1e-6)

        gf = jax.grad(lambda p: fused_m.apply(
            {"params": p}, ids, labels=labels).loss)(params)
        gn = jax.grad(lambda p: naive_m.apply(
            {"params": p}, ids, labels=labels).loss)(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-6), gf, gn)


def test_sasrec_hstu_fused_matches_naive():
    from genrec_tpu.models.hstu import HSTU
    from genrec_tpu.models.sasrec import SASRec
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, 31, (3, 8)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 31, (3, 8)), jnp.int32)
    ts = jnp.asarray(np.cumsum(rng.integers(1000, 9999, (3, 8)), 1),
                     jnp.int32)

    for make, kwargs in (
        (SASRec, dict(num_items=30, max_seq_len=8, embed_dim=16,
                      num_heads=2, num_blocks=1, ffn_dim=32, dropout=0.0)),
        (HSTU, dict(num_items=30, max_seq_len=8, embed_dim=32,
                    num_heads=2, num_blocks=1, dropout=0.0)),
    ):
        fused_m = make(**kwargs, fused_ce=True)
        naive_m = make(**kwargs, fused_ce=False)
        extra = {"timestamps": ts} if make is HSTU else {}
        params = naive_m.init({"params": jax.random.PRNGKey(0)}, ids,
                              **extra)["params"]
        lf = fused_m.apply({"params": params}, ids, targets=tgt,
                           **extra).loss
        ln = naive_m.apply({"params": params}, ids, targets=tgt,
                           **extra).loss
        np.testing.assert_allclose(float(lf), float(ln), rtol=1e-6)
        gf = jax.grad(lambda p: fused_m.apply(
            {"params": p}, ids, targets=tgt, **extra).loss)(params)
        gn = jax.grad(lambda p: naive_m.apply(
            {"params": p}, ids, targets=tgt, **extra).loss)(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-6), gf, gn)


def test_bf16_fused_close_to_naive():
    """Production dtype: bf16 activations/table, fp32 stats — the fused
    loss tracks the naive one within bf16 resolution."""
    rng = np.random.default_rng(11)
    N, D, V = 64, 32, 300
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(V, D)) * 0.3, jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    lf = fused_linear_cross_entropy(x, w, labels, -100, 128, True)
    ln = _naive(x, w, labels, True)
    np.testing.assert_allclose(float(lf), float(ln), rtol=2e-2)
    gf = jax.grad(lambda a: fused_linear_cross_entropy(
        a, w, labels, -100, 128, True))(x)
    gn = jax.grad(lambda a: _naive(a, w, labels, True))(x)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(gn, np.float32), atol=2e-2)
