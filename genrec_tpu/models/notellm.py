"""NoteLLM: LLM-based query/item embedding with contrastive training (Flax).

Parity target: ``/root/reference/genrec/models/notellm.py``
(``Query2Embedding``): a causal LM with an ``[EMB]`` special token whose
hidden state is the sentence embedding (:113-129); contrastive loss over an
(even, odd) paired batch with a learned temperature ``tau`` and hard-negative
down-weighting (:170-189); optional category-generation CE mixed by ``alpha``
(:191-203); ``compute_metrics`` top-k retrieval accuracy (:236-265). The
reference wires no trainer for this model (absent from
``trainers/__init__.py:128-135``) — same here: the model + loss are the
deliverable, trained via the generic engine if needed.

Backbone: the in-repo :class:`genrec_tpu.models.llm.CausalLM` (the reference
uses HF Qwen2; no downloads in this environment).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from genrec_tpu.configlib import gin
from genrec_tpu.ops.normalize import l2norm
from .llm import CausalLM


class NoteLLMOutput(NamedTuple):
    loss: jnp.ndarray
    contrastive_loss: jnp.ndarray
    generation_loss: jnp.ndarray
    embeddings: jnp.ndarray   # (B, D)


@gin.configurable
class Query2Embedding(nn.Module):
    """Causal LM + [EMB]-position pooling + paired contrastive loss."""
    vocab_size: int = 32000
    emb_token_id: int = 5      # reserved id for [EMB]
    d_model: int = 512
    n_layers: int = 8
    n_heads: int = 8
    n_kv_heads: int = 4
    ff_dim: int = 1408
    max_len: int = 512
    alpha: float = 0.0         # weight of the generation CE term
    hard_negative_margin: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lm = CausalLM(vocab_size=self.vocab_size, d_model=self.d_model,
                           n_layers=self.n_layers, n_heads=self.n_heads,
                           n_kv_heads=self.n_kv_heads, ff_dim=self.ff_dim,
                           max_len=self.max_len, dtype=self.dtype,
                           name="lm")
        self.tau = self.param("tau", nn.initializers.constant(0.05), ())

    def _pool(self, hidden: jnp.ndarray, input_ids: jnp.ndarray,
              attention_mask: jnp.ndarray) -> jnp.ndarray:
        """[EMB]-position pooling + L2 norm (ref :113-129)."""
        B, L = input_ids.shape
        is_emb = (input_ids == self.emb_token_id).astype(jnp.int32)
        # position of the last [EMB] occurrence (0 if none -> last real token)
        pos_idx = jnp.arange(L)[None, :]
        emb_pos = jnp.max(jnp.where(is_emb > 0, pos_idx, -1), axis=1)
        fallback = jnp.maximum(jnp.sum(attention_mask, axis=1) - 1, 0)
        emb_pos = jnp.where(emb_pos >= 0, emb_pos, fallback)
        emb = hidden[jnp.arange(B), emb_pos]                   # (B, D)
        return l2norm(emb.astype(jnp.float32))

    def embed(self, input_ids: jnp.ndarray,
              attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, D) L2-normalised [EMB]-position embeddings — the serving
        entry point (no paired-batch loss machinery)."""
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.int32)
        hidden = self.lm.hidden_states(input_ids, attention_mask)
        return self._pool(hidden, input_ids, attention_mask)

    def embed_cached(self, prompt_ids: jnp.ndarray, input_ids: jnp.ndarray,
                     attention_mask: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
        """Shared-prompt embedding: the instruction prefix ``prompt_ids``
        (P,) — identical for every row — is prefilled ONCE (batch 1), its
        KV broadcast across the batch, and only the per-note suffix
        ``input_ids`` (B, L) runs through the transformer.

        TPU re-design of the reference's custom HF ``DynamicCache``
        (``/root/reference/genrec/models/notellm.py:20-41``, consumed at
        :144-156 via ``batch_select_indices``): same semantics — prompt KV
        is computed without gradient (the reference builds its cache
        outside the training graph) — but as one compiled program, with
        the broadcast expressed as an XLA broadcast instead of a device
        dict. Saves the prompt's P·B forward FLOPs per step (computed
        once, not B times)."""
        B, L = input_ids.shape
        P = prompt_ids.shape[0]
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.int32)
        _, cache, cache_mask, _ = self.lm.prefill(
            prompt_ids[None, :], jnp.ones((1, P), jnp.int32), P + L)

        def bc(t):
            return jnp.broadcast_to(t, (B,) + t.shape[1:])
        cache = [(jax.lax.stop_gradient(bc(k)),
                  jax.lax.stop_gradient(bc(v))) for k, v in cache]
        hidden, _ = self.lm.extend(input_ids, attention_mask, cache,
                                   bc(cache_mask), P)
        return self._pool(hidden, input_ids, attention_mask)

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 category_labels: Optional[jnp.ndarray] = None,
                 shared_prompt_ids: Optional[jnp.ndarray] = None
                 ) -> NoteLLMOutput:
        """Paired-batch forward: rows (2i, 2i+1) are positive pairs.

        ``shared_prompt_ids`` (P,): train with the shared-prompt KV cache
        (``input_ids`` are then the per-note suffixes). The generation CE
        term needs full-sequence logits and is not supported on the cached
        path (the reference trains NoteLLM contrastive-only by default:
        alpha enters at :199-203 only when labels exist)."""
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.int32)
        if shared_prompt_ids is not None:
            if category_labels is not None and self.alpha > 0:
                raise ValueError("generation CE is not supported with "
                                 "shared_prompt_ids (contrastive-only)")
            emb = self.embed_cached(shared_prompt_ids, input_ids,
                                    attention_mask)
        else:
            emb = self.embed(input_ids, attention_mask)

        # contrastive loss over (even, odd) pairs (ref :170-189)
        q = emb[0::2]                                          # (B/2, D)
        d = emb[1::2]
        tau = jnp.maximum(self.tau, 1e-3)
        sim = (q @ d.T) / tau                                  # (B/2, B/2)
        n = q.shape[0]
        labels = jnp.arange(n)
        # hard-negative down-weighting: negatives closer than the positive
        # minus a margin get their logits reduced
        pos = jnp.diagonal(sim)[:, None]
        is_neg = ~jnp.eye(n, dtype=bool)
        hard = is_neg & (sim > pos - self.hard_negative_margin / tau)
        sim_adj = jnp.where(hard, sim - self.hard_negative_margin / tau, sim)
        logp = jax.nn.log_softmax(sim_adj, axis=-1)
        c_loss = -jnp.mean(jnp.diagonal(logp))

        g_loss = jnp.zeros(())
        if category_labels is not None and self.alpha > 0:
            out = self.lm(input_ids, attention_mask=attention_mask,
                          labels=category_labels)
            g_loss = out.loss
        loss = (1.0 - self.alpha) * c_loss + self.alpha * g_loss
        return NoteLLMOutput(loss=loss, contrastive_loss=c_loss,
                             generation_loss=g_loss, embeddings=emb)


def compute_metrics(query_emb: np.ndarray, doc_emb: np.ndarray,
                    ks=(1, 5, 10)) -> dict:
    """Top-k retrieval accuracy of paired embeddings (ref :236-265)."""
    sim = np.asarray(query_emb) @ np.asarray(doc_emb).T
    ranks = (-sim).argsort(axis=1)
    n = sim.shape[0]
    out = {}
    for k in ks:
        hits = sum(1 for i in range(n) if i in ranks[i, :k])
        out[f"acc@{k}"] = hits / n
    return out


def query2embedding_from_backbone(backbone_dir: str, rng,
                                  alpha: float = 0.0,
                                  max_len: int = 512,
                                  dtype=jnp.float32):
    """Build a Query2Embedding on a converted Qwen2 backbone artifact.

    Mirrors the reference's Qwen2 wrapping (notellm.py:44-129): dims come
    from the artifact, an ``[EMB]`` token is appended to the vocabulary
    (its id = old vocab size) and the embedding table grows by one row;
    everything but that row and ``tau`` starts from the pretrained weights.
    Returns ``(model, params, emb_token_id)``.
    """
    import json
    import os

    import orbax.checkpoint as ocp

    from genrec_tpu.interop import QWEN2_BACKBONE_FORMAT
    from .llm import resize_token_embeddings

    with open(os.path.join(backbone_dir, "config.json")) as f:
        bcfg = json.load(f)
    if bcfg.get("format") != QWEN2_BACKBONE_FORMAT:
        raise ValueError(f"not a qwen2 backbone artifact: {backbone_dir}")
    mk = bcfg["model"]
    emb_token_id = mk["vocab_size"]
    model = Query2Embedding(
        vocab_size=mk["vocab_size"] + 1, emb_token_id=emb_token_id,
        d_model=mk["d_model"], n_layers=mk["n_layers"],
        n_heads=mk["n_heads"], n_kv_heads=mk["n_kv_heads"],
        ff_dim=mk["ff_dim"], max_len=max_len, alpha=alpha, dtype=dtype)
    ckptr = ocp.StandardCheckpointer()
    lm_params = ckptr.restore(
        os.path.join(os.path.abspath(backbone_dir), "params"))
    rng, r1 = jax.random.split(rng)
    lm_params = resize_token_embeddings(lm_params, mk["vocab_size"] + 1, r1)
    params = {"lm": lm_params,
              "tau": jnp.asarray(0.05, jnp.float32)}
    return model, params, emb_token_id
