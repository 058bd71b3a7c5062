"""Dense trie automaton for constrained semantic-ID decoding.

The reference walks a Python-dict trie per beam per step inside generation
(``/root/reference/genrec/models/tiger.py:41-69`` build, ``:366-376`` mask
loop, ``:426-434`` node advance) — host-side work that cannot live under jit
and dominates its eval time. Here the trie is precompiled once on the host
into dense numpy tables (cf. PAPERS.md "Vectorizing the Trie"):

* ``children[node, token] -> node``  (int32, ``DEAD`` = no such child)
* ``legal[node, token] -> bool``

so that during jit-compiled beam search the per-step constraint is one gather
``legal[nodes]`` and the advance is one gather ``children[nodes, tokens]``.
Depth equals ``sem_id_dim`` (3-4), so node ids fit comfortably in int32.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

DEAD = 0          # node 0 is the dead state: no legal continuations
ROOT = 1          # node 1 is the root


class TrieTables(NamedTuple):
    children: np.ndarray   # (n_nodes, K) int32
    legal: np.ndarray      # (n_nodes, K) bool
    depth: int
    num_tokens: int

    @property
    def n_nodes(self) -> int:
        return self.children.shape[0]


def build_trie_tables(valid_ids: np.ndarray, num_tokens: int) -> TrieTables:
    """Compile (N, C) valid code tuples into dense automaton tables.

    Node layout: 0 = dead, 1 = root, then one node per distinct prefix of
    length 1..C-1 (full-length tuples all map to the dead node: after C
    tokens generation stops, so their transitions are never taken).
    """
    valid_ids = np.asarray(valid_ids, dtype=np.int64)
    N, C = valid_ids.shape
    if np.any(valid_ids < 0) or np.any(valid_ids >= num_tokens):
        raise ValueError("valid_ids out of range for num_tokens")

    # assign node ids to distinct prefixes level by level
    node_of_prefix = {(): ROOT}
    next_id = 2
    prefixes = [()] * N
    prefix_rows = [[] for _ in range(C)]  # (parent_node, token, child_node)
    for level in range(C):
        seen = {}
        col = valid_ids[:, level]
        for r in range(N):
            parent = prefixes[r]
            key = parent + (int(col[r]),)
            if key not in seen:
                if level == C - 1:
                    child = DEAD  # complete tuple: no continuation
                else:
                    child = next_id
                    next_id += 1
                seen[key] = child
                prefix_rows[level].append(
                    (node_of_prefix[parent], int(col[r]), child))
                node_of_prefix[key] = child
            prefixes[r] = key

    n_nodes = next_id
    children = np.full((n_nodes, num_tokens), DEAD, np.int32)
    legal = np.zeros((n_nodes, num_tokens), bool)
    for level in range(C):
        for parent, token, child in prefix_rows[level]:
            children[parent, token] = child
            legal[parent, token] = True
    # dead node: everything stays dead/illegal (already zero-initialised)
    return TrieTables(children=children, legal=legal, depth=C,
                      num_tokens=num_tokens)


class PackedTrie(NamedTuple):
    """Memory-compressed trie: per-level sorted prefix-key arrays.

    The dense automaton is O(n_nodes × K): at production scale (200k items,
    4 levels, K=256) that is ~0.6 GB of ``children`` alone. Here a beam's
    "node" is the *index* of its prefix in the previous level's sorted key
    array; a level's keys are ``parent_index·K + token`` (re-based each
    level so keys stay ≤ items·K — int32-safe; raw radix keys would
    overflow int32 at 256⁴ and JAX silently truncates int64 without x64
    mode). Legality of token ``t`` is membership of ``node·K + t`` in the
    level's sorted keys (vectorized binary search) and the advance is the
    found position. Total memory is O(Σ #prefixes) ≈ items × depth × 4
    bytes (~3 MB at the same scale, ~200× below dense), traded for
    log₂(N) gather steps per level inside the compiled search.
    """
    level_keys: tuple          # level c → sorted int32 re-based keys
    depth: int
    num_tokens: int

    @property
    def nbytes(self) -> int:
        return sum(k.nbytes for k in self.level_keys)


def build_packed_trie(valid_ids: np.ndarray, num_tokens: int) -> PackedTrie:
    valid_ids = np.asarray(valid_ids, dtype=np.int64)
    N, C = valid_ids.shape
    if np.any(valid_ids < 0) or np.any(valid_ids >= num_tokens):
        raise ValueError("valid_ids out of range for num_tokens")
    if N * num_tokens >= 2 ** 31:
        raise ValueError(
            f"{N} items × {num_tokens} tokens exceeds int32 packed keys")
    parent_idx = np.zeros(N, np.int64)
    level_keys = []
    for c in range(C):
        cand = parent_idx * num_tokens + valid_ids[:, c]
        uniq = np.unique(cand)
        level_keys.append(uniq.astype(np.int32))
        parent_idx = np.searchsorted(uniq, cand)
    return PackedTrie(level_keys=tuple(level_keys), depth=C,
                      num_tokens=num_tokens)


def packed_membership(sorted_keys, cand):
    """Vectorized membership test of ``cand`` (any shape, int64) in the
    sorted 1-D ``sorted_keys`` — jit-safe binary search + verify gather."""
    import jax.numpy as jnp
    idx = jnp.searchsorted(sorted_keys, cand)
    idx = jnp.clip(idx, 0, sorted_keys.shape[0] - 1)
    return sorted_keys[idx] == cand


def dense_trie_bytes(n_items: int, depth: int, num_tokens: int) -> int:
    """Upper-bound memory of the dense automaton (children + legal)."""
    n_nodes = 2 + n_items * max(depth - 1, 1)
    return n_nodes * num_tokens * 5
