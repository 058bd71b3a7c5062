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
