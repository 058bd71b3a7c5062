"""Fully-vectorized (jit-able) beam search over semantic-ID codes.

Parity target: ``Tiger.generate``
(``/root/reference/genrec/models/tiger.py:312-452``): K beams, per step draw
``KK = min(K*6, K_codebook)`` candidates per beam (the reference samples
without replacement via ``torch.multinomial``; we default to deterministic
top-KK and offer Gumbel-top-k sampling, preserving eval-quality — not
bitwise — equivalence), trie-constrained masking to ``-1e32``, Python
sort+dedup beam merge → here a sort-free vectorized merge.

Why dedup only at step 0: all K beams start identical, so step-0 candidates
collide across parents (dedup by token). After step 0 the kept beams are
pairwise-distinct sequences; a step-t candidate is (parent sequence ⊕ token)
and top-KK per parent never repeats a token, so no duplicates can arise
(filler beams carry ``-inf`` scores and lose every comparison).

The step callback re-runs the decoder on the fixed-length prefix — depth is
``sem_id_dim`` (3-4) so this is a static Python loop, one XLA program per
prefix length, no KV-cache machinery needed at this scale.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .trie import ROOT, PackedTrie, TrieTables, packed_membership

NEG = -1e32


class BeamState(NamedTuple):
    seqs: jnp.ndarray    # (B, K, C) int32, filled progressively
    logps: jnp.ndarray   # (B, K) float32
    nodes: jnp.ndarray   # (B, K) int32 trie nodes


class BeamSearchOutput(NamedTuple):
    sem_ids: jnp.ndarray    # (B, K, C)
    log_probas: jnp.ndarray  # (B, K)


def _dedup_by_token_mask(tokens: jnp.ndarray, scores: jnp.ndarray,
                         num_tokens: int) -> jnp.ndarray:
    """(B, M) keep-mask: True for the best-scoring occurrence of each token.

    O(M²) pairwise dominance with earliest-index tie-break; M = K·KK is a few
    hundred, so the (B, M, M) bool tensor is cheap and fully vectorized.
    """
    m = tokens.shape[1]
    idx = jnp.arange(m)
    eq = tokens[:, :, None] == tokens[:, None, :]            # (B, M, M)
    earlier = idx[None, :] < idx[:, None]                     # (M, M) j<i
    better = (scores[:, None, :] > scores[:, :, None]) | (
        (scores[:, None, :] == scores[:, :, None]) & earlier[None])
    dominated = jnp.any(eq & better, axis=2)
    return ~dominated


def beam_search(
    decode_fn: Callable[[jnp.ndarray, int], jnp.ndarray],
    batch_size: int,
    num_beams: int,
    depth: int,
    num_tokens: int,
    trie: Optional[TrieTables] = None,
    trie_children: Optional[jnp.ndarray] = None,
    trie_legal: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    candidates_per_beam: Optional[int] = None,
    sample: bool = False,
    rng: Optional[jax.Array] = None,
) -> BeamSearchOutput:
    """Run constrained beam search.

    ``decode_fn(prefix_ids, step) -> (B*K, num_tokens)`` returns next-token
    logits for the *raw* (per-level) token alphabet at ``step`` given
    ``prefix_ids`` of shape (B*K, step); the caller handles any vocab offsets.
    """
    B, K, C = batch_size, num_beams, depth
    KK = candidates_per_beam or min(K * 6, num_tokens)
    packed = trie if isinstance(trie, PackedTrie) else None
    if packed is not None:
        trie = None
        level_keys = [jnp.asarray(lk) for lk in packed.level_keys]
    if trie is not None:
        trie_children = jnp.asarray(trie.children)
        trie_legal = jnp.asarray(trie.legal)

    # packed mode: a beam's node is its prefix's index in the previous
    # level's sorted key array (int32, root=0)
    state = BeamState(
        seqs=jnp.zeros((B, K, C), jnp.int32),
        logps=jnp.zeros((B, K), jnp.float32),
        nodes=(jnp.zeros((B, K), jnp.int32) if packed is not None
               else jnp.full((B, K), ROOT, jnp.int32)))

    for step in range(C):
        prefix = state.seqs[:, :, :step].reshape(B * K, step)
        logits = decode_fn(prefix, step)                     # (B*K, V_tok)
        logits = logits.astype(jnp.float32)

        if packed is not None:
            cand = (state.nodes.reshape(-1)[:, None] * packed.num_tokens
                    + jnp.arange(num_tokens, dtype=jnp.int32)[None])
            legal = packed_membership(level_keys[step], cand)  # (B*K, V)
            logits = jnp.where(legal, logits, NEG)
        elif trie_legal is not None:
            legal = trie_legal[state.nodes.reshape(-1)]      # (B*K, V_tok)
            logits = jnp.where(legal, logits, NEG)

        logp = jax.nn.log_softmax(logits / temperature, axis=-1)
        if sample:
            if rng is None:
                raise ValueError("sample=True requires rng")
            from genrec_tpu.ops.gumbel import sample_gumbel
            g = sample_gumbel(jax.random.fold_in(rng, step), logp.shape)
            perturbed = logp + g                              # Gumbel top-k ==
            _, cand_tok = jax.lax.top_k(perturbed, KK)        # sampling w/o repl.
        else:
            _, cand_tok = jax.lax.top_k(logp, KK)
        cand_logp = jnp.take_along_axis(logp, cand_tok, axis=1)

        cand_tok = cand_tok.reshape(B, K, KK)
        cand_logp = cand_logp.reshape(B, K, KK)
        total = state.logps[:, :, None] + cand_logp           # (B, K, KK)
        flat_scores = total.reshape(B, K * KK)
        flat_tok = cand_tok.reshape(B, K * KK)
        parent = jnp.repeat(jnp.arange(K), KK)[None].repeat(B, 0)

        if step == 0:
            keep = _dedup_by_token_mask(flat_tok, flat_scores, num_tokens)
            flat_scores = jnp.where(keep, flat_scores, NEG)

        top_scores, top_idx = jax.lax.top_k(flat_scores, K)   # (B, K)
        top_parent = jnp.take_along_axis(parent, top_idx, axis=1)
        top_tok = jnp.take_along_axis(flat_tok, top_idx, axis=1)

        batch_ix = jnp.arange(B)[:, None]
        new_seqs = state.seqs[batch_ix, top_parent]           # (B, K, C)
        new_seqs = new_seqs.at[:, :, step].set(top_tok)
        if packed is not None:
            parent_nodes = state.nodes[batch_ix, top_parent]
            chosen = parent_nodes * packed.num_tokens + top_tok
            new_nodes = jnp.searchsorted(
                level_keys[step], chosen).astype(jnp.int32)
        elif trie_children is not None:
            parent_nodes = state.nodes[batch_ix, top_parent]
            new_nodes = trie_children[parent_nodes, top_tok]
        else:
            new_nodes = state.nodes
        state = BeamState(seqs=new_seqs, logps=top_scores, nodes=new_nodes)

    return BeamSearchOutput(sem_ids=state.seqs, log_probas=state.logps)
