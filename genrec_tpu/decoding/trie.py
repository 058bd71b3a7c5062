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
