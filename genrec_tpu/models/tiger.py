"""TIGER: generative retrieval over semantic IDs (Flax).

Parity target: ``/root/reference/genrec/models/tiger.py``: model layout
(:87-147 — BOS parameter, RMS input norms, ``SemIdEmbedding`` +
``UserIdEmbedding``, positional-embedding params present but **disabled**
:172-179, ``in_proj``/``in_proj_context`` to ``attn_dim``, T5
encoder-decoder with ``n_layers//2`` per side and ff=1024, full-vocab output
head of ``num_item_embeddings*sem_id_dim+1``), training loss = per-position CE
against ``token_type*K + id``, summed over the C digits then batch-meaned
(:232-240), ``_encode_context`` (:261-281) and per-step decoder re-runs
(:283-310), and trie-constrained beam generation (:312-452 — reimplemented as
a jit-compiled vectorized search in :mod:`genrec_tpu.decoding`).

TPU-first notes: generation is compiled end-to-end — encoder runs once, the
C-step loop is unrolled (C=3-4), the trie constraint is a table gather, and
the beam merge is top-k, so eval has zero host↔device ping-pong (the
reference crosses the boundary per beam per step).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from genrec_tpu.nn.dropout import Dropout as HwDropout

from genrec_tpu.configlib import gin
from genrec_tpu.decoding.beam import beam_search
from genrec_tpu.decoding.trie import TrieTables, build_trie_tables
from genrec_tpu.nn import (RMSNorm, SemIdEmbedding, TransformerEncoderDecoder,
                           UserIdEmbedding)


class TigerOutput(NamedTuple):
    logits: jnp.ndarray
    loss: Optional[jnp.ndarray]
    per_digit_loss: Optional[jnp.ndarray] = None  # (B, C) CE per target digit


@gin.configurable
class Tiger(nn.Module):
    embedding_dim: int = 128
    attn_dim: int = 384
    dropout: float = 0.1
    num_heads: int = 6
    n_layers: int = 8
    num_item_embeddings: int = 256
    num_user_embeddings: int = 10000
    sem_id_dim: int = 3
    max_pos: int = 2048
    dtype: jnp.dtype = jnp.float32

    @property
    def vocab_size(self) -> int:
        return self.num_item_embeddings * self.sem_id_dim + 1

    def setup(self):
        self.bos_embedding = self.param(
            "bos_embedding", nn.initializers.normal(stddev=1.0),
            (self.embedding_dim,))
        self.norm = RMSNorm(self.embedding_dim)
        self.norm_context = RMSNorm(self.embedding_dim)
        self.sem_id_embedding = SemIdEmbedding(
            num_embeddings=self.num_item_embeddings,
            sem_ids_dim=self.sem_id_dim,
            embeddings_dim=self.embedding_dim, dtype=self.dtype)
        self.user_id_embedding = UserIdEmbedding(
            num_embeddings=self.num_user_embeddings,
            embeddings_dim=self.embedding_dim, dtype=self.dtype)
        # init parity: the reference leaves these at torch's nn.Linear
        # default (kaiming_uniform(a=√5) = U(±1/√fan_in), tiger.py:132-147)
        from genrec_tpu.nn.transformer import TORCH_LINEAR_INIT
        self.in_proj = nn.Dense(self.attn_dim, use_bias=False,
                                kernel_init=TORCH_LINEAR_INIT,
                                dtype=self.dtype)
        self.in_proj_context = nn.Dense(self.attn_dim, use_bias=False,
                                        kernel_init=TORCH_LINEAR_INIT,
                                        dtype=self.dtype)
        self.transformer = TransformerEncoderDecoder(
            d_model=self.attn_dim, nhead=self.num_heads,
            num_encoder_layers=self.n_layers // 2,
            num_decoder_layers=self.n_layers // 2,
            dim_feedforward=1024, dropout=self.dropout, dtype=self.dtype)
        self.output_head = nn.Dense(self.vocab_size, use_bias=False,
                                    kernel_init=TORCH_LINEAR_INIT,
                                    dtype=self.dtype)
        self.drop = HwDropout(self.dropout)

    def _embed_context(self, user_ids, sem_ids, token_type_ids, seq_mask,
                       deterministic):
        user_emb = self.user_id_embedding(user_ids[:, None])     # (B, 1, D)
        item_emb = self.sem_id_embedding(sem_ids, token_type_ids)
        enc_in = jnp.concatenate([user_emb, item_emb], axis=1)
        enc_in = self.in_proj_context(
            self.drop(self.norm_context(enc_in),
                      deterministic=deterministic))
        pad = jnp.concatenate([
            jnp.zeros((sem_ids.shape[0], 1), bool),
            jnp.logical_not(seq_mask.astype(bool))], axis=1)
        return enc_in, pad

    def _embed_targets(self, target_ids, target_type_ids, deterministic):
        B = target_ids.shape[0]
        bos = jnp.broadcast_to(
            self.bos_embedding.astype(self.dtype)[None, None, :],
            (B, 1, self.embedding_dim))
        tgt_emb = self.sem_id_embedding(target_ids, target_type_ids)
        dec_in = jnp.concatenate([bos, tgt_emb], axis=1)
        return self.in_proj(self.drop(self.norm(dec_in),
                                      deterministic=deterministic))

    def __call__(self, user_ids, sem_ids, token_type_ids, sem_ids_fut,
                 token_type_ids_fut, seq_mask,
                 deterministic: bool = True) -> TigerOutput:
        B = sem_ids.shape[0]
        enc_in, pad = self._embed_context(user_ids, sem_ids, token_type_ids,
                                          seq_mask, deterministic)
        dec_in = self._embed_targets(sem_ids_fut, token_type_ids_fut,
                                     deterministic)
        dec_out = self.transformer(
            enc_in, dec_in, src_key_padding_mask=pad,
            memory_key_padding_mask=pad, deterministic=deterministic)
        logits = self.output_head(dec_out).astype(jnp.float32)
        loss_logits = logits[:, :-1, :]

        loss = None
        per_digit_loss = None
        if sem_ids_fut.shape[1] == self.sem_id_dim:
            target_vocab = (token_type_ids_fut * self.num_item_embeddings
                            + sem_ids_fut)
            logp = jax.nn.log_softmax(loss_logits, axis=-1)
            tgt_logp = jnp.take_along_axis(
                logp, target_vocab[..., None], axis=-1)[..., 0]
            per_digit_loss = -tgt_logp                       # (B, C)
            loss = jnp.mean(jnp.sum(per_digit_loss, axis=1))
        return TigerOutput(logits=logits, loss=loss,
                           per_digit_loss=per_digit_loss)

    def encode_context(self, user_ids, sem_ids, token_type_ids, seq_mask):
        enc_in, pad = self._embed_context(user_ids, sem_ids, token_type_ids,
                                          seq_mask, deterministic=True)
        memory = self.transformer.encode(enc_in, src_key_padding_mask=pad)
        return memory, pad

    def decode_step(self, memory, memory_pad, prefix_ids):
        """Next-token logits given (BK, t) generated code prefix."""
        BK, t = prefix_ids.shape
        if t == 0:
            dec_in = self._embed_targets(
                jnp.zeros((BK, 0), jnp.int32), jnp.zeros((BK, 0), jnp.int32),
                deterministic=True)
        else:
            types = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                     (BK, t))
            dec_in = self._embed_targets(prefix_ids, types,
                                         deterministic=True)
        dec_out = self.transformer.decode(
            dec_in, memory, memory_key_padding_mask=memory_pad)
        return self.output_head(dec_out[:, -1, :]).astype(jnp.float32)

    def precompute_cross_kv(self, memory):
        """Per-decoder-layer cross (k, v) of the encoder memory — computed
        once per generate call (see make_generate_fn)."""
        return self.transformer.precompute_cross_kv(memory)

    def decode_step_cached(self, cross_kv, memory_pad, prefix_ids,
                           num_beams: int):
        """Flattened-beam decode: the (B·K, t) prefixes of one batch row
        run as K independent causal blocks of ONE sequence (length
        K·(t+1) with BOS), cross-attending the batch row's cached memory
        K/V — no ``jnp.repeat`` of the memory and no per-beam/per-level
        re-projection of cross K/V (the r4 path recomputed that dominant
        FLOP term K·C times; VERDICT r4 next #2). Relative-position
        self-attention bias stays exact: within-block relative distances
        are unchanged and cross-block pairs are masked."""
        from genrec_tpu.nn.transformer import NEG_INF
        BK, t = prefix_ids.shape
        K = num_beams
        B = BK // K
        if t == 0:
            dec_in = self._embed_targets(
                jnp.zeros((BK, 0), jnp.int32), jnp.zeros((BK, 0), jnp.int32),
                deterministic=True)
        else:
            types = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                     (BK, t))
            dec_in = self._embed_targets(prefix_ids, types,
                                         deterministic=True)
        L = t + 1                                   # BOS + prefix
        x = dec_in.reshape(B, K * L, dec_in.shape[-1])
        allow = jnp.kron(jnp.eye(K, dtype=jnp.int32),
                         jnp.tril(jnp.ones((L, L), jnp.int32))) > 0
        tgt_mask = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
        dec_out = self.transformer.decode(
            x, None, tgt_mask=tgt_mask, memory_key_padding_mask=memory_pad,
            cross_kv=cross_kv)
        last = dec_out[:, jnp.arange(K) * L + (L - 1), :]   # (B, K, D)
        return self.output_head(last).astype(jnp.float32).reshape(
            BK, self.vocab_size)


class TigerGenerationOutput(NamedTuple):
    sem_ids: jnp.ndarray
    log_probas: jnp.ndarray


def make_generate_fn(model: Tiger, trie: Optional[TrieTables],
                     num_beams: int = 10, temperature: float = 0.2,
                     sample: bool = False):
    """Build a jit-compiled ``generate(params, batch, rng) -> output``.

    The per-level vocab offset (``step * K + id``, reference tiger.py:363-364)
    is applied by slicing the full-vocab logits down to the step's K-token
    window, so the beam searcher works in the raw code alphabet.
    """
    K_tok = model.num_item_embeddings
    C = model.sem_id_dim
    trie_children = jnp.asarray(trie.children) if trie is not None else None
    trie_legal = jnp.asarray(trie.legal) if trie is not None else None

    # r5 fast path: cross K/V cached per generate call + flattened-beam
    # decode (decode_step_cached) — no memory repeat, no K·C-fold cross-KV
    # re-projection. GENREC_TPU_NO_CACHED_GENERATE=1 keeps the r4 layout
    # as the A/B baseline/oracle (tests pin equal outputs).
    import os
    cached = os.environ.get("GENREC_TPU_NO_CACHED_GENERATE", "") in ("", "0")

    @jax.jit
    def generate(params, user_ids, sem_ids, token_type_ids, seq_mask, rng):
        B = sem_ids.shape[0]
        memory, pad = model.apply({"params": params}, user_ids, sem_ids,
                                  token_type_ids, seq_mask,
                                  method=Tiger.encode_context)
        if cached:
            cross_kv = model.apply({"params": params}, memory,
                                   method=Tiger.precompute_cross_kv)

            def decode_fn(prefix_ids, step):
                logits = model.apply({"params": params}, cross_kv, pad,
                                     prefix_ids, num_beams,
                                     method=Tiger.decode_step_cached)
                off = step * K_tok
                return jax.lax.dynamic_slice_in_dim(logits, off, K_tok,
                                                    axis=1)
        else:
            # expand memory to B*K beams (r4 baseline layout)
            mem_k = jnp.repeat(memory, num_beams, axis=0)
            pad_k = jnp.repeat(pad, num_beams, axis=0)

            def decode_fn(prefix_ids, step):
                logits = model.apply({"params": params}, mem_k, pad_k,
                                     prefix_ids, method=Tiger.decode_step)
                off = step * K_tok
                return jax.lax.dynamic_slice_in_dim(logits, off, K_tok,
                                                    axis=1)

        return beam_search(
            decode_fn, B, num_beams, C, K_tok,
            trie_children=trie_children, trie_legal=trie_legal,
            temperature=temperature, sample=sample, rng=rng)

    return generate


def build_trie(valid_item_ids: np.ndarray, num_item_embeddings: int,
               max_dense_bytes: int = 64 << 20):
    """Host-side trie compilation from the catalog's (N, C) code table.

    Small catalogs get the dense automaton (one-gather legality); catalogs
    whose dense tables would exceed ``max_dense_bytes`` (e.g. 200k items ×
    4 levels × K=256 ≈ 0.6 GB) get the :class:`PackedTrie` sorted-key form
    (~100× smaller, binary-search legality) — same beam results.
    """
    from genrec_tpu.decoding.trie import build_packed_trie, dense_trie_bytes
    valid_item_ids = np.asarray(valid_item_ids)
    n, c = valid_item_ids.shape
    if dense_trie_bytes(n, c, num_item_embeddings) > max_dense_bytes:
        return build_packed_trie(valid_item_ids, num_item_embeddings)
    return build_trie_tables(valid_item_ids, num_item_embeddings)
