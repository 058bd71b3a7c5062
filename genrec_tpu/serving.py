"""Serving-side inference APIs.

The reference ships no serving layer (SURVEY.md §1: "no serving layer"); for
production deployment this module packages the trained artifacts behind
batch-inference classes with compiled hot paths:

* :class:`SASRecRecommender` / :class:`HSTURecommender` — next-item top-k
  from raw id histories (full-catalog scoring, optionally sharded).
* :class:`TigerRecommender` — trie-constrained semantic-ID generation mapped
  back to catalog item ids.
* :class:`LCRecRecommender` — LLM seqrec prompt → compiled KV-cache
  constrained beam decode → catalog item ids.
* :class:`CobraRecommender` — cascaded sparse+dense beam_fusion retrieval
  over a precomputed item dense-vector index.
* :class:`NoteLLMEmbedder` — batch [EMB] sentence embeddings + cosine
  retrieval.

All entry points pad to fixed shapes so the compiled executable is reused
across requests.
"""

from __future__ import annotations

from functools import partial

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.core import CheckpointManager, load_rqvae_artifact


def _bucket(n: int) -> int:
    """Round a request's row count up to the next power of two so the
    compiled executable is reused across request sizes (a distinct batch
    shape would otherwise recompile — minutes on the remote TPU compile
    service). Outputs are sliced back to the true count."""
    b = 1
    while b < n:
        b *= 2
    return b


def _maybe_quantize(params, quantize_int8: bool):
    """(possibly int8-quantized params, in-jit dequant fn).

    With ``quantize_int8`` the large tables/kernels live in device HBM as
    int8 + per-channel scales (≈2× smaller than bf16, 4× than fp32); the
    dequant runs inside the compiled serving fn so XLA fuses the upcast
    into the consuming matmul (``ops/quant.py``).
    """
    if not quantize_int8:
        return params, lambda p: p
    from genrec_tpu.ops.quant import dequantize_tree, quantize_tree
    return quantize_tree(params), dequantize_tree


def _pad_histories(histories: Sequence[Sequence[int]], max_len: int,
                   one_based: bool) -> np.ndarray:
    out = np.zeros((len(histories), max_len), np.int32)
    for r, h in enumerate(histories):
        h = [i + 1 for i in h] if one_based else list(h)
        h = h[-max_len:]
        out[r, max_len - len(h):] = h
    return out


class SASRecRecommender:
    """Batch next-item recommendation from a trained SASRec checkpoint."""

    def __init__(self, model, params, max_seq_len: Optional[int] = None,
                 quantize_int8: bool = False):
        from genrec_tpu.models.sasrec import predict_topk
        self.model = model
        self.params, deq = _maybe_quantize(params, quantize_int8)
        self.max_seq_len = max_seq_len or model.max_seq_len

        @partial(jax.jit, static_argnums=(2,))
        def _recommend(params, ids, k):
            out = model.apply({"params": deq(params)}, ids,
                              deterministic=True)
            return predict_topk(out.logits[:, -1, :], k)
        self._fn = _recommend

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, model) -> "SASRecRecommender":
        ckpt = CheckpointManager(ckpt_dir)
        dummy = jnp.zeros((1, model.max_seq_len), jnp.int32)
        template = jax.tree_util.tree_map(
            np.asarray,
            model.init({"params": jax.random.PRNGKey(0)}, dummy)["params"])
        params = ckpt.restore(template)
        return cls(model, params)

    def recommend(self, histories: Sequence[Sequence[int]],
                  k: int = 10) -> np.ndarray:
        """0-based item-id histories → (B, k) 0-based recommendations."""
        B = len(histories)
        ids = _pad_histories(histories, self.max_seq_len, one_based=True)
        ids = np.pad(ids, ((0, _bucket(B) - B), (0, 0)))
        top = self._fn(self.params, jnp.asarray(ids), k)
        return np.asarray(top)[:B] - 1


class HSTURecommender(SASRecRecommender):
    """HSTU variant: carries timestamps alongside the id history."""

    def __init__(self, model, params, max_seq_len: Optional[int] = None,
                 quantize_int8: bool = False):
        from genrec_tpu.models.sasrec import predict_topk
        self.model = model
        self.params, deq = _maybe_quantize(params, quantize_int8)
        self.max_seq_len = max_seq_len or model.max_seq_len

        @partial(jax.jit, static_argnums=(3,))
        def _recommend(params, ids, ts, k):
            out = model.apply({"params": deq(params)}, ids, timestamps=ts,
                              deterministic=True)
            return predict_topk(out.logits[:, -1, :], k)
        self._fn = _recommend

    def recommend(self, histories, k: int = 10, timestamps=None) -> np.ndarray:
        B = len(histories)
        cap = _bucket(B)
        ids = _pad_histories(histories, self.max_seq_len, one_based=True)
        ids = np.pad(ids, ((0, cap - B), (0, 0)))
        L = self.max_seq_len
        ts = np.zeros((cap, L), np.int32)
        if timestamps is not None:
            for r, t in enumerate(timestamps):
                t = list(t)[-L:]
                ts[r, L - len(t):] = t
        top = self._fn(self.params, jnp.asarray(ids), jnp.asarray(ts), k)
        return np.asarray(top)[:B] - 1


class TigerRecommender:
    """Generative retrieval: histories → semantic-ID beams → item ids."""

    def __init__(self, model, params, sem_ids: np.ndarray,
                 num_beams: int = 10, max_seq_len: int = 20,
                 quantize_int8: bool = False):
        from genrec_tpu.models.tiger import build_trie, make_generate_fn
        self.model = model
        self.params, deq = _maybe_quantize(params, quantize_int8)
        self.sem_ids = np.asarray(sem_ids, np.int32)
        self.max_seq_len = max_seq_len
        trie = build_trie(self.sem_ids, model.num_item_embeddings)
        inner = make_generate_fn(model, trie, num_beams=num_beams)
        # jit-of-jit inlines: the dequant fuses into the compiled search
        self._generate = jax.jit(lambda p, *a: inner(deq(p), *a))
        # code tuple -> item id (first occurrence wins, as in the catalog)
        self._code_to_item = {}
        for item, codes in enumerate(self.sem_ids):
            self._code_to_item.setdefault(tuple(int(c) for c in codes), item)

    @classmethod
    def from_artifacts(cls, tiger_ckpt_dir: str, rqvae_artifact_dir: str,
                       model, **kw) -> "TigerRecommender":
        _, _, sem_ids = load_rqvae_artifact(rqvae_artifact_dir)
        ckpt = CheckpointManager(tiger_ckpt_dir)
        C = model.sem_id_dim
        dummy = dict(
            user_ids=jnp.zeros((1,), jnp.int32),
            sem_ids=jnp.zeros((1, C), jnp.int32),
            token_type_ids=jnp.arange(C, dtype=jnp.int32)[None],
            sem_ids_fut=jnp.zeros((1, C), jnp.int32),
            token_type_ids_fut=jnp.arange(C, dtype=jnp.int32)[None],
            seq_mask=jnp.ones((1, C), bool))
        template = jax.tree_util.tree_map(
            np.asarray,
            model.init({"params": jax.random.PRNGKey(0)}, **dummy)["params"])
        restored = ckpt.restore(template)
        return cls(model, restored, sem_ids, **kw)

    def recommend(self, user_ids: Sequence[int],
                  histories: Sequence[Sequence[int]],
                  k: int = 10) -> List[List[int]]:
        """0-based item histories → per-row ranked item ids (≤ k each)."""
        from genrec_tpu.data.batching import tiger_batch
        from genrec_tpu.data.sequences import Sample
        B = len(histories)
        samples = [Sample(user_id=int(u), history=list(h), target=0)
                   for u, h in zip(user_ids, histories)]
        samples += [Sample(user_id=0, history=[0], target=0)
                    ] * (_bucket(B) - B)
        batch = tiger_batch(samples, self.sem_ids, self.max_seq_len,
                            pad_id=self.model.num_item_embeddings
                            * self.model.sem_id_dim)
        out = self._generate(self.params, jnp.asarray(batch.user_ids),
                             jnp.asarray(batch.sem_ids),
                             jnp.asarray(batch.token_type_ids),
                             jnp.asarray(batch.seq_mask),
                             jax.random.PRNGKey(0))
        results = []
        for beams, logps in zip(np.asarray(out.sem_ids)[:B],
                                np.asarray(out.log_probas)[:B]):
            row = []
            for codes, lp in zip(beams, logps):
                if lp <= -1e30:
                    continue
                item = self._code_to_item.get(tuple(int(c) for c in codes))
                if item is not None and item not in row:
                    row.append(item)
                if len(row) == k:
                    break
            results.append(row)
        return results


class LCRecRecommender:
    """LLM-based generative retrieval: histories → seqrec prompt →
    constrained beam decode of ``<Ci_j>`` codes → item ids.

    Serving counterpart of the LCRec eval loop
    (trainers/lcrec_trainer.py); the decode is the compiled
    KV-cache beam search (``LCRec.make_generate_topk``), so per-request
    cost is one prompt prefill plus C single-token steps.
    """

    def __init__(self, lcrec, params, sem_ids: np.ndarray,
                 num_beams: int = 10, prompt_len: int = 256,
                 max_seq_len: int = 20, use_item_trie: bool = True,
                 quantize_int8: bool = False):
        from genrec_tpu.data.lcrec import SFT_PROMPT, TEMPLATES, render_history
        self.lcrec = lcrec
        self.params, deq = _maybe_quantize(params, quantize_int8)
        self.sem_ids = np.asarray(sem_ids, np.int32)[:, :lcrec.num_codebooks]
        self.prompt_len = prompt_len
        self.max_seq_len = max_seq_len
        self._template = SFT_PROMPT.format(
            instruction=TEMPLATES["seqrec"][0])
        self._render_history = render_history
        inner = lcrec.make_generate_topk(
            num_beams=num_beams,
            valid_item_ids=self.sem_ids if use_item_trie else None)
        self._generate = jax.jit(lambda p, *a: inner(deq(p), *a))
        self._code_to_item = {}
        for item, codes in enumerate(self.sem_ids):
            self._code_to_item.setdefault(tuple(int(c) for c in codes), item)

    @classmethod
    def from_pretrained(cls, save_dir: str, rqvae_artifact_dir: str,
                        **kw) -> "LCRecRecommender":
        from genrec_tpu.models.lcrec import LCRec
        lcrec, params = LCRec.load_pretrained(save_dir)
        _, _, sem_ids = load_rqvae_artifact(rqvae_artifact_dir)
        return cls(lcrec, params, sem_ids, **kw)

    def _prompt(self, history: Sequence[int]) -> str:
        hist = list(history)[-self.max_seq_len:]
        codes = ["".join(f"<C{i}_{int(c)}>"
                         for i, c in enumerate(self.sem_ids[item]))
                 for item in hist]
        return self._template.format(history=self._render_history(codes))

    def recommend(self, histories: Sequence[Sequence[int]],
                  k: int = 10) -> List[List[int]]:
        """0-based item histories → per-row ranked item ids (≤ k each)."""
        B, L = len(histories), self.prompt_len
        cap = _bucket(B)
        ids = np.zeros((cap, L), np.int32)
        mask = np.zeros((cap, L), np.int32)
        mask[B:, -1] = 1     # padding rows: one valid token keeps the
        for r, h in enumerate(histories):        # prefill bias finite
            p = self.lcrec.tokenizer.encode(self._prompt(h))[-L:]
            ids[r, L - len(p):] = p
            mask[r, L - len(p):] = 1
        out = self._generate(self.params, jnp.asarray(ids),
                             jnp.asarray(mask))
        results = []
        for beams, logps in zip(np.asarray(out.sem_ids)[:B],
                                np.asarray(out.log_probas)[:B]):
            row = []
            for codes, lp in zip(beams, logps):
                if lp <= -1e30:
                    continue
                item = self._code_to_item.get(tuple(int(c) for c in codes))
                if item is not None and item not in row:
                    row.append(item)
                if len(row) == k:
                    break
            results.append(row)
        return results


class CobraRecommender:
    """Cascaded sparse+dense retrieval: histories → ``beam_fusion``
    (beam over semantic IDs + dense nearest-neighbour, score fusion —
    reference cobra.py:679-760) → catalog item ids.

    All-item dense vectors are precomputed once at construction (the
    reference recomputes them per eval, cobra_trainer.py:303-334 — for a
    fixed serving snapshot once is enough).
    """

    def __init__(self, model, params, sem_ids: np.ndarray,
                 item_tokens: np.ndarray, max_items: int = 10,
                 n_beam: int = 50, alpha: float = 0.5,
                 quantize_int8: bool = False):
        from genrec_tpu.models.cobra import Cobra, beam_fusion
        self.model = model
        self.params, deq = _maybe_quantize(params, quantize_int8)
        self.sem_ids = np.asarray(sem_ids, np.int32)
        self.item_tokens = np.asarray(item_tokens, np.int32)
        self.max_items = max_items

        @jax.jit
        def itemvec(p, toks):
            return model.apply({"params": deq(p)}, toks,
                               method=Cobra.generate_itemvec)

        from genrec_tpu.ops.batched import batched_apply
        self._item_vecs = batched_apply(
            lambda t: itemvec(self.params, t), self.item_tokens, 512)

        # item_vecs passed as an operand (not closed over): a captured
        # device array would be inlined into the HLO as a literal constant
        @partial(jax.jit, static_argnums=(4,))
        def _recommend(p, ids, toks, item_vecs, k):
            return beam_fusion(model, deq(p), ids, toks, item_vecs,
                               self.sem_ids, n_candidates=k, n_beam=n_beam,
                               alpha=alpha)
        self._fn = _recommend

    def recommend(self, histories: Sequence[Sequence[int]],
                  k: int = 10) -> np.ndarray:
        """0-based item histories → (B, k) ranked item ids."""
        from genrec_tpu.data.cobra import cobra_batch
        from genrec_tpu.data.sequences import Sample
        B = len(histories)
        samples = [Sample(user_id=0, history=list(h), target=0)
                   for h in histories]
        samples += [Sample(user_id=0, history=[0], target=0)
                    ] * (_bucket(B) - B)
        batch = cobra_batch(samples, self.sem_ids, self.item_tokens,
                            self.max_items, self.model.pad_id,
                            include_target=False)
        out = self._fn(self.params, jnp.asarray(batch.input_ids),
                       jnp.asarray(batch.encoder_input_ids),
                       self._item_vecs, k)
        return np.asarray(out.item_ids)[:B]


class NoteLLMEmbedder:
    """Batch [EMB] sentence embeddings + cosine retrieval
    (``Query2Embedding``; the reference wires no serving for it either —
    SURVEY §2.2 NoteLLM row)."""

    def __init__(self, model, params, quantize_int8: bool = False):
        self.model = model
        self.params, deq = _maybe_quantize(params, quantize_int8)

        from genrec_tpu.models.notellm import Query2Embedding

        @jax.jit
        def _embed(p, ids, mask):
            return model.apply({"params": deq(p)}, ids, mask,
                               method=Query2Embedding.embed)
        self._fn = _embed

    def embed(self, token_rows: Sequence[Sequence[int]],
              max_len: int = 0) -> np.ndarray:
        """Right-padded token-id rows → (B, D) L2-normalised embeddings."""
        B = len(token_rows)
        # bucket the sequence axis too: a distinct L is a distinct compile
        L = max_len or _bucket(max(len(r) for r in token_rows))
        ids = np.zeros((_bucket(B), L), np.int32)
        for r, row in enumerate(token_rows):
            row = list(row)[:L]
            ids[r, :len(row)] = row
        mask = (ids != 0).astype(np.int32)
        out = self._fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out)[:B]

    def retrieve(self, query_rows: Sequence[Sequence[int]],
                 doc_embeddings: np.ndarray, k: int = 10,
                 max_len: int = 0) -> np.ndarray:
        """(B, k) indices of the nearest docs by cosine similarity."""
        q = self.embed(query_rows, max_len=max_len)
        sim = q @ np.asarray(doc_embeddings).T
        return np.argsort(-sim, axis=1)[:, :k]
