"""TIGER model and generation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.models.tiger import Tiger, build_trie, make_generate_fn


@pytest.fixture(scope="module")
def tiny_tiger():
    model = Tiger(embedding_dim=32, attn_dim=48, dropout=0.0, num_heads=4,
                  n_layers=2, num_item_embeddings=16, num_user_embeddings=100,
                  sem_id_dim=3)
    B, L, C = 2, 4, 3
    batch = dict(
        user_ids=jnp.array([3, 7], jnp.int32),
        sem_ids=jnp.tile(jnp.arange(L * C, dtype=jnp.int32) % 16, (B, 1)),
        token_type_ids=jnp.tile(jnp.arange(C, dtype=jnp.int32), (B, L)),
        sem_ids_fut=jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32),
        token_type_ids_fut=jnp.tile(jnp.arange(C, dtype=jnp.int32), (B, 1)),
        seq_mask=jnp.ones((B, L * C), bool))
    params = model.init({"params": jax.random.PRNGKey(0)}, **batch)["params"]
    return model, params, batch


def test_forward_loss_and_logits(tiny_tiger):
    model, params, batch = tiny_tiger
    out = model.apply({"params": params}, **batch)
    # decoder sees BOS + 3 targets -> 4 positions; vocab = 16*3+1
    assert out.logits.shape == (2, 4, 49)
    assert np.isfinite(float(out.loss))


def test_loss_is_sum_over_digits_mean_over_batch(tiny_tiger):
    model, params, batch = tiny_tiger
    out = model.apply({"params": params}, **batch)
    logits = np.asarray(out.logits)[:, :-1, :]
    tvocab = np.asarray(batch["token_type_ids_fut"]) * 16 + \
        np.asarray(batch["sem_ids_fut"])
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    want = float(np.mean(np.sum(
        -np.take_along_axis(np.asarray(logp), tvocab[..., None],
                            axis=-1)[..., 0], axis=1)))
    np.testing.assert_allclose(float(out.loss), want, rtol=1e-5)


def test_padding_invariance(tiny_tiger):
    """Changing ids in masked context positions must not change the loss."""
    model, params, batch = tiny_tiger
    mask = batch["seq_mask"].at[:, -3:].set(False)
    b1 = dict(batch, seq_mask=mask)
    out1 = model.apply({"params": params}, **b1)
    b2 = dict(b1, sem_ids=b1["sem_ids"].at[:, -3:].set(15))
    out2 = model.apply({"params": params}, **b2)
    np.testing.assert_allclose(float(out1.loss), float(out2.loss), rtol=1e-5)


def test_user_id_affects_output(tiny_tiger):
    model, params, batch = tiny_tiger
    out1 = model.apply({"params": params}, **batch)
    out2 = model.apply({"params": params},
                       **dict(batch, user_ids=jnp.array([3, 8], jnp.int32)))
    assert not np.allclose(np.asarray(out1.logits[1]),
                           np.asarray(out2.logits[1]))


def test_generate_respects_trie(tiny_tiger):
    model, params, batch = tiny_tiger
    rng = np.random.default_rng(0)
    valid = np.unique(rng.integers(0, 16, size=(30, 3)), axis=0)
    trie = build_trie(valid, num_item_embeddings=16)
    gen = make_generate_fn(model, trie, num_beams=5, temperature=0.2)
    out = gen(params, batch["user_ids"], batch["sem_ids"],
              batch["token_type_ids"], batch["seq_mask"],
              jax.random.PRNGKey(0))
    assert out.sem_ids.shape == (2, 5, 3)
    valid_set = {tuple(v) for v in valid}
    for b in range(2):
        for k in range(5):
            if float(out.log_probas[b, k]) > -1e30:
                assert tuple(np.asarray(out.sem_ids[b, k])) in valid_set


def test_generate_unconstrained_in_range(tiny_tiger):
    model, params, batch = tiny_tiger
    gen = make_generate_fn(model, None, num_beams=4)
    out = gen(params, batch["user_ids"], batch["sem_ids"],
              batch["token_type_ids"], batch["seq_mask"],
              jax.random.PRNGKey(0))
    ids = np.asarray(out.sem_ids)
    assert ids.min() >= 0 and ids.max() < 16
    # beams per row are distinct tuples
    for b in range(ids.shape[0]):
        tups = [tuple(r) for r in ids[b]]
        assert len(tups) == len(set(tups))


def test_generate_beams_are_sorted_by_logp(tiny_tiger):
    model, params, batch = tiny_tiger
    gen = make_generate_fn(model, None, num_beams=6)
    out = gen(params, batch["user_ids"], batch["sem_ids"],
              batch["token_type_ids"], batch["seq_mask"],
              jax.random.PRNGKey(0))
    lp = np.asarray(out.log_probas)
    assert (np.diff(lp, axis=1) <= 1e-6).all()


def test_training_reduces_loss(tiny_tiger):
    import optax
    model, params, batch = tiny_tiger
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            return model.apply({"params": p}, **batch).loss
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    p = params
    for _ in range(30):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_dense_init_matches_torch_linear_default(tiny_tiger):
    """Init parity (r4): every TIGER-path Dense kernel must follow torch's
    nn.Linear default kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in))
    (reference tiger.py:132-147, modules/transformer.py:67-74,177-178) --
    flax's lecun_normal default has 3x the variance."""
    _, params, _ = tiny_tiger
    kernels = [(path, leaf) for path, leaf in
               jax.tree_util.tree_leaves_with_path(params)
               if path[-1].key == "kernel"]
    assert kernels, "no Dense kernels found"
    for path, w in kernels:
        fan_in = w.shape[0]
        bound = 1.0 / np.sqrt(fan_in)
        name = jax.tree_util.keystr(path)
        assert float(jnp.abs(w).max()) <= bound + 1e-6, name
        # uniform(+-b) std = b/sqrt(3); tolerate sampling noise
        std = float(w.std())
        assert 0.7 * bound / np.sqrt(3) < std < 1.3 * bound / np.sqrt(3), \
            (name, std, bound)


def test_cached_generate_matches_baseline(tiny_tiger, monkeypatch):
    """The r5 flattened-beam/cached-cross-KV generate path must produce
    the same beams and scores as the r4 repeat-memory layout (same math,
    different schedule)."""
    model, params, batch = tiny_tiger
    rng = np.random.default_rng(1)
    valid = np.unique(rng.integers(0, 16, size=(40, 3)), axis=0)
    trie = build_trie(valid, num_item_embeddings=16)
    args = (params, batch["user_ids"], batch["sem_ids"],
            batch["token_type_ids"], batch["seq_mask"],
            jax.random.PRNGKey(0))
    outs = {}
    for mode, env in (("cached", "0"), ("baseline", "1")):
        monkeypatch.setenv("GENREC_TPU_NO_CACHED_GENERATE", env)
        gen = make_generate_fn(model, trie, num_beams=5, temperature=0.2)
        outs[mode] = gen(*args)
    np.testing.assert_array_equal(np.asarray(outs["cached"].sem_ids),
                                  np.asarray(outs["baseline"].sem_ids))
    np.testing.assert_allclose(np.asarray(outs["cached"].log_probas),
                               np.asarray(outs["baseline"].log_probas),
                               atol=1e-4)
