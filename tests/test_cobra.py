"""COBRA model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.models.cobra import Cobra, beam_fusion


@pytest.fixture(scope="module")
def tiny_cobra():
    model = Cobra(encoder_n_layers=1, encoder_hidden_dim=32,
                  encoder_num_heads=4, encoder_vocab_size=100,
                  id_vocab_size=8, n_codebooks=3, d_model=32,
                  decoder_n_layers=1, decoder_num_heads=4,
                  decoder_dropout=0.0)
    rng = np.random.default_rng(0)
    B, T, C, Lt = 2, 4, 3, 5
    ids = rng.integers(0, 8, (B, T * C)).astype(np.int32)
    ids[1, -3:] = model.pad_id
    toks = rng.integers(1, 100, (B, T, Lt)).astype(np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(ids), jnp.asarray(toks))["params"]
    return model, params, jnp.asarray(ids), jnp.asarray(toks)


def test_forward_outputs_finite(tiny_cobra):
    model, params, ids, toks = tiny_cobra
    out = model.apply({"params": params}, ids, toks)
    for f in out._fields:
        assert np.isfinite(np.asarray(getattr(out, f))).all(), f


def test_gradients_finite_with_padding(tiny_cobra):
    """Regression: l2norm at zero rows used to produce NaN grads."""
    import optax
    model, params, ids, toks = tiny_cobra
    toks_padded = toks.at[1, -1, :].set(0)  # fully-pad text row

    def lf(p):
        return model.apply({"params": p}, ids, toks_padded).loss

    g = jax.grad(lf)(params)
    assert np.isfinite(float(optax.global_norm(g)))


def test_generate_shapes_and_validity(tiny_cobra):
    model, params, ids, toks = tiny_cobra
    out = model.apply({"params": params}, ids, toks, n_candidates=4,
                      method=Cobra.generate)
    assert out.sem_ids.shape == (2, 4, 3)
    assert out.dense_vecs.shape[0:2] == (2, 4)
    sem = np.asarray(out.sem_ids)
    assert sem.min() >= 0 and sem.max() < 8
    # dense vecs are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.dense_vecs), axis=-1), 1.0, rtol=1e-4)
    # scores sorted descending
    assert (np.diff(np.asarray(out.scores), axis=1) <= 1e-5).all()


def test_beam_fusion_returns_catalog_items(tiny_cobra):
    model, params, ids, toks = tiny_cobra
    rng = np.random.default_rng(1)
    N = 20
    item_vecs = rng.normal(size=(N, 32)).astype(np.float32)
    item_sem = rng.integers(0, 8, (N, 3)).astype(np.int32)
    out = beam_fusion(model, params, ids, toks,
                      jnp.asarray(item_vecs), jnp.asarray(item_sem),
                      n_candidates=5, n_beam=8)
    assert out.item_ids.shape == (2, 5)
    assert np.asarray(out.item_ids).max() < N
    assert out.sem_ids.shape == (2, 5, 3)
    # fused scores in [0, 1] and sorted
    s = np.asarray(out.scores)
    assert (s >= 0).all() and (s <= 1.0 + 1e-6).all()
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_cascade_loss_uses_correct_positions(tiny_cobra):
    """Changing the *last* item's codes must not change the sparse loss for
    targets other than itself... sanity: masking target item to pad reduces
    the number of counted tokens."""
    model, params, ids, toks = tiny_cobra
    out_full = model.apply({"params": params}, ids, toks)
    ids2 = ids.at[0, -3:].set(model.pad_id)
    out_masked = model.apply({"params": params}, ids2, toks)
    assert float(out_masked.acc_total) < float(out_full.acc_total)


def test_training_reduces_loss(tiny_cobra):
    import optax
    model, params, ids, toks = tiny_cobra
    tx = optax.adam(3e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        def lf(p):
            return model.apply({"params": p}, ids, toks).loss
        loss, g = jax.value_and_grad(lf)(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, loss

    p = params
    losses = []
    for _ in range(25):
        p, state, loss = step(p, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_cobra_fused_softmax_matches_fallback(tiny_cobra):
    """COBRA decoder's fused-softmax path (pallas interpreter on CPU)
    matches the plain XLA attention."""
    import genrec_tpu.kernels.attention as fattn
    model, params, ids, toks = tiny_cobra
    out_plain = model.apply({"params": params}, ids, toks)
    fattn.INTERPRET = True
    try:
        out_fused = model.apply({"params": params}, ids, toks)
    finally:
        fattn.INTERPRET = False
    np.testing.assert_allclose(float(out_fused.loss),
                               float(out_plain.loss), rtol=2e-5)


# ------------------------------------------------------- text dedupe path

def test_dedupe_rows_gather_back_exact():
    """Deduped unique rows + text_idx reproduce the naive (B,T,L) tokens."""
    from genrec_tpu.data.cobra import _dedupe_rows
    rng = np.random.default_rng(3)
    item_tokens = rng.integers(1, 50, (30, 7)).astype(np.int32)
    item_mat = rng.integers(0, 30, (6, 5)).astype(np.int64)
    item_mat[0, 3:] = -1                       # padded tail
    item_mat[2, :] = item_mat[1, :]            # fully duplicated history
    rows, idx = _dedupe_rows(item_mat, item_tokens)
    assert rows.shape[0] & (rows.shape[0] - 1) == 0  # pow2 bucket
    naive = np.where(item_mat[..., None] >= 0,
                     item_tokens[np.maximum(item_mat, 0)], 0)
    np.testing.assert_array_equal(rows[idx], naive)
    assert (rows[0] == 0).all()                # pad-text row
    assert (idx[0, 3:] == 0).all()


def test_dedupe_forward_and_grads_match_naive(tiny_cobra):
    """Deterministic loss and grads are identical between the naive
    per-position encode and the unique-row encode + gather."""
    import optax
    from genrec_tpu.data.cobra import _dedupe_rows
    model, params, ids, _ = tiny_cobra
    rng = np.random.default_rng(11)
    item_tokens = rng.integers(1, 100, (10, 5)).astype(np.int32)
    item_mat = rng.integers(0, 10, (2, 4)).astype(np.int64)
    item_mat[1, 1] = item_mat[0, 0]            # cross-row duplicate
    item_mat[1, 3] = -1
    naive = np.where(item_mat[..., None] >= 0,
                     item_tokens[np.maximum(item_mat, 0)], 0
                     ).astype(np.int32)
    rows, idx = _dedupe_rows(item_mat, item_tokens)

    def loss(p, toks, tidx):
        return model.apply({"params": p}, ids, jnp.asarray(toks),
                           text_idx=tidx).loss

    l_naive, g_naive = jax.value_and_grad(loss)(params, naive, None)
    l_dd, g_dd = jax.value_and_grad(loss)(params, rows, jnp.asarray(idx))
    np.testing.assert_allclose(float(l_naive), float(l_dd), rtol=1e-5)
    flat_n = {str(p): a for p, a in
              jax.tree_util.tree_flatten_with_path(g_naive)[0]}
    flat_d = {str(p): a for p, a in
              jax.tree_util.tree_flatten_with_path(g_dd)[0]}
    assert flat_n.keys() == flat_d.keys()
    for k in flat_n:
        np.testing.assert_allclose(np.asarray(flat_n[k]),
                                   np.asarray(flat_d[k]),
                                   rtol=5e-4, atol=1e-5, err_msg=k)


def test_dedupe_generate_matches_naive(tiny_cobra):
    from genrec_tpu.data.cobra import _dedupe_rows
    model, params, ids, _ = tiny_cobra
    rng = np.random.default_rng(7)
    item_tokens = rng.integers(1, 100, (10, 5)).astype(np.int32)
    item_mat = rng.integers(0, 10, (2, 4)).astype(np.int64)
    naive = np.where(item_mat[..., None] >= 0,
                     item_tokens[np.maximum(item_mat, 0)], 0
                     ).astype(np.int32)
    rows, idx = _dedupe_rows(item_mat, item_tokens)
    g1 = model.apply({"params": params}, ids, jnp.asarray(naive),
                     n_candidates=4, method=Cobra.generate)
    g2 = model.apply({"params": params}, ids, jnp.asarray(rows),
                     n_candidates=4, text_idx=jnp.asarray(idx),
                     method=Cobra.generate)
    np.testing.assert_array_equal(np.asarray(g1.sem_ids),
                                  np.asarray(g2.sem_ids))
    np.testing.assert_allclose(np.asarray(g1.scores),
                               np.asarray(g2.scores), rtol=1e-5, atol=1e-6)


def test_cobra_batch_dedupe_flag():
    from genrec_tpu.data.cobra import cobra_batch
    from genrec_tpu.data.sequences import Sample
    rng = np.random.default_rng(0)
    sem = rng.integers(0, 8, (10, 3)).astype(np.int32)
    toks = rng.integers(1, 50, (10, 5)).astype(np.int32)
    samples = [Sample(user_id=0, history=[1, 2, 1], target=3),
               Sample(user_id=1, history=[2, 2], target=4)]
    b_naive = cobra_batch(samples, sem, toks, max_items=4, pad_id=24,
                          include_target=True, dedupe_texts=False)
    b_dd = cobra_batch(samples, sem, toks, max_items=4, pad_id=24,
                       include_target=True, dedupe_texts=True)
    assert b_naive.text_idx is None
    np.testing.assert_array_equal(b_naive.input_ids, b_dd.input_ids)
    np.testing.assert_array_equal(
        b_dd.encoder_input_ids[b_dd.text_idx], b_naive.encoder_input_ids)
    # 5 unique ids (1,2,3,4 + pad) => bucket 8 < B*T rows
    assert b_dd.encoder_input_ids.shape[0] == 8


def test_pad_batch_rows_skips_non_batch_fields():
    """Partial-batch padding must leave the deduped (U, L) rows alone."""
    from genrec_tpu.data.batching import pad_batch_rows
    from genrec_tpu.data.cobra import CobraBatch
    b = CobraBatch(input_ids=np.zeros((3, 6), np.int32),
                   encoder_input_ids=np.ones((8, 5), np.int32),
                   target_item=np.arange(3, dtype=np.int32),
                   target_sem_ids=np.zeros((3, 3), np.int32),
                   valid=np.ones((3,), bool),
                   text_idx=np.ones((3, 2), np.int32))
    p = pad_batch_rows(b, 4)
    assert p.input_ids.shape == (4, 6)
    assert p.text_idx.shape == (4, 2)
    assert (p.text_idx[3] == 0).all()          # pad rows -> pad-text row
    assert p.encoder_input_ids.shape == (8, 5)  # untouched
    assert p.valid.tolist() == [True, True, True, False]


def test_cobra_init_matches_torch_defaults():
    """Init parity (r4): embeddings N(0,1) (torch nn.Embedding default),
    MHA in-projection xavier_uniform with zero bias, other Dense kernels
    at torch nn.Linear default U(+-1/sqrt(fan_in)) (reference
    cobra.py:21-27, 150-224; torch MultiheadAttention._reset_parameters)."""
    import jax
    import numpy as np
    from genrec_tpu.models.cobra import Cobra

    model = Cobra(encoder_n_layers=1, encoder_hidden_dim=64,
                  encoder_num_heads=4, encoder_vocab_size=500,
                  id_vocab_size=32, n_codebooks=3, d_model=64,
                  decoder_n_layers=2, decoder_num_heads=4)
    import jax.numpy as jnp
    ids = jnp.zeros((2, 12), jnp.int32)
    toks = jnp.ones((2, 4, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, toks)["params"]

    emb = np.asarray(params["id_embed"]["embedding"])
    assert 0.9 < emb.std() < 1.1, emb.std()            # N(0,1)
    enc_emb = np.asarray(params["encoder"]["embedding"]["embedding"])
    assert 0.9 < enc_emb.std() < 1.1, enc_emb.std()

    qkv = np.asarray(params["dec_0"]["qkv"]["kernel"])  # xavier_uniform
    fan_in, fan_out = qkv.shape
    xav = np.sqrt(6.0 / (fan_in + fan_out))
    assert np.abs(qkv).max() <= xav + 1e-6
    assert np.abs(np.asarray(params["dec_0"]["qkv"]["bias"])).max() == 0.0

    w = np.asarray(params["head_0"]["kernel"])          # torch Linear
    bound = 1.0 / np.sqrt(w.shape[0])
    assert np.abs(w).max() <= bound + 1e-6
    b = np.asarray(params["head_0"]["bias"])
    assert 0 < np.abs(b).max() <= bound + 1e-6          # torch bias uniform


def test_generate_cached_matches_full(tiny_cobra):
    """KV-cached cascade == full re-forward cascade (same math, different
    schedule): exact sem_ids, allclose scores/dense vecs. Covers padded
    rows (row 1 carries a padded item)."""
    model, params, ids, toks = tiny_cobra
    full = model.apply({"params": params}, ids, toks, n_candidates=4,
                       method=Cobra.generate)
    cached = model.apply({"params": params}, ids, toks, n_candidates=4,
                         method=Cobra.generate_cached)
    np.testing.assert_array_equal(np.asarray(cached.sem_ids),
                                  np.asarray(full.sem_ids))
    np.testing.assert_allclose(np.asarray(cached.scores),
                               np.asarray(full.scores), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cached.dense_vecs),
                               np.asarray(full.dense_vecs), atol=1e-4)


def test_generate_cached_single_codebook():
    """C=1 edge: no decode steps, h_last broadcast from the prefill."""
    model = Cobra(encoder_n_layers=1, encoder_hidden_dim=32,
                  encoder_num_heads=4, encoder_vocab_size=50,
                  id_vocab_size=8, n_codebooks=1, d_model=32,
                  decoder_n_layers=1, decoder_num_heads=4,
                  decoder_dropout=0.0)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 8, (2, 4)).astype(np.int32))
    toks = jnp.asarray(rng.integers(1, 50, (2, 4, 5)).astype(np.int32))
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        toks)["params"]
    full = model.apply({"params": params}, ids, toks, n_candidates=3,
                       method=Cobra.generate)
    cached = model.apply({"params": params}, ids, toks, n_candidates=3,
                         method=Cobra.generate_cached)
    np.testing.assert_array_equal(np.asarray(cached.sem_ids),
                                  np.asarray(full.sem_ids))
    np.testing.assert_allclose(np.asarray(cached.dense_vecs),
                               np.asarray(full.dense_vecs), atol=1e-4)
