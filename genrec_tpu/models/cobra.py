"""COBRA: cascaded sparse+dense generative recommendation (Flax).

Parity target: ``/root/reference/genrec/models/cobra.py``:
``CobraEmbedding`` (:47-147 — per-item ``C`` sparse code tokens followed by 1
dense text vector, codebook-offset fused id table with pad row, token-type
{sparse, dense} and absolute position embeddings), causal decoder (:150-224),
cascade sparse loss (c=0 predicted from the previous item's dense position
``v_t``, c>0 from the same item's previous codebook position; :417-457),
in-batch InfoNCE dense loss masking same-sequence negatives (:466-493),
metrics: token top1/top5 acc, item recall, cos-sim, codebook entropy
(:510-527), per-codebook beam ``generate`` (:531-665) and ``beam_fusion``
(:679-760 — score fusion ``α·softmax(beam) + (1-α)·(sim+1)/2`` against
precomputed item dense vectors). The reference's cross-batch memory-queue
InfoNCE variant (:283-320) is dead code there (commented out in forward) and
is intentionally not carried over; the active in-batch InfoNCE is.

TPU-first notes: the reference interleaves sparse/dense tokens with dynamic
Python chunking; with static (T, C) the interleave is a reshape —
``concat([(B,T,C,D) codes, (B,T,1,D) vecs], 2).reshape(B, T*(C+1), D)`` —
and generation appends ≤C partial tokens, each prefix length its own compiled
program (C is 3). Beam expansion is pure top-k; no host loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from genrec_tpu.nn.dropout import Dropout as HwDropout

from genrec_tpu.configlib import gin
from genrec_tpu.nn.encoder import LightTextEncoder
from genrec_tpu.ops.normalize import l2norm


class CobraOutput(NamedTuple):
    loss: jnp.ndarray
    loss_sparse: jnp.ndarray
    loss_dense: jnp.ndarray
    acc_correct: jnp.ndarray
    acc_total: jnp.ndarray
    recall_correct: jnp.ndarray
    recall_total: jnp.ndarray
    vec_cos_sim: jnp.ndarray
    codebook_entropy: jnp.ndarray


class CobraGenerationOutput(NamedTuple):
    sem_ids: jnp.ndarray     # (B, K, C)
    dense_vecs: jnp.ndarray  # (B, K, D)
    scores: jnp.ndarray      # (B, K)


class BeamFusionOutput(NamedTuple):
    item_ids: jnp.ndarray    # (B, K)
    sem_ids: jnp.ndarray     # (B, K, C)
    scores: jnp.ndarray      # (B, K)


class CobraDecoderBlock(nn.Module):
    """Post-norm causal decoder layer (the reference's TransformerDecoder is
    used memory-free, so it degenerates to causal self-attention + FFN)."""
    dim: int
    num_heads: int
    ff_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, causal, deterministic: bool = True,
                 return_kv: bool = False, cache_kv=None,
                 write_index: int = 0, extra_kv=None, attn_bias=None):
        """Generation fast path (r5, apply-time only — the param tree is
        created by the standard call):

        - ``return_kv=True``: also return this layer's raw (B, L, D)
          k/v splits (prefill collects them once per batch row).
        - ``cache_kv=(k_dec, v_dec)`` + ``extra_kv=(k_hist, v_hist)`` +
          ``attn_bias``: incremental beam decode — x is (B, K, D) beam
          queries, their k/v are written at ``write_index`` into the
          decoded-slot cache, and attention runs over
          [history keys ‖ decoded slots] under ``attn_bias``
          (B, 1, K, Lh+slots). Returns (out, new_cache_kv).
        """
        # init parity with torch nn.TransformerDecoderLayer (the reference
        # CobraDecoder, cobra.py:150-224): MHA in_proj xavier_uniform +
        # zero bias; out_proj/linear1/linear2 at torch Linear defaults
        from genrec_tpu.nn.transformer import (TORCH_LINEAR_INIT,
                                               XAVIER_UNIFORM_INIT,
                                               torch_linear_bias_init)
        B, L, D = x.shape
        H, Dh = self.num_heads, D // self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype,
                       kernel_init=XAVIER_UNIFORM_INIT, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        new_cache = None
        if cache_kv is not None:
            k_cache, v_cache = cache_kv
            k_dec = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype), (0, write_index, 0))
            v_dec = jax.lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype), (0, write_index, 0))
            new_cache = (k_dec, v_dec)
            kh, vh = extra_kv
            k_full = jnp.concatenate([kh.astype(k.dtype), k_dec], axis=1)
            v_full = jnp.concatenate([vh.astype(v.dtype), v_dec], axis=1)
            split = lambda t: t.reshape(B, t.shape[1], H, Dh).transpose(
                0, 2, 1, 3)
            qh, kh2, vh2 = split(q), split(k_full), split(v_full)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh2,
                preferred_element_type=jnp.float32) * (Dh ** -0.5)
            scores = scores + attn_bias
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vh2,
                              preferred_element_type=jnp.float32)
            attn = attn.astype(self.dtype).transpose(
                0, 2, 1, 3).reshape(B, L, D)
            attn = nn.Dense(D, dtype=self.dtype,
                            kernel_init=TORCH_LINEAR_INIT,
                            name="attn_out")(attn)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="norm1")(x + attn).astype(self.dtype)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name="norm_cross")(x).astype(self.dtype)
            h = nn.Dense(self.ff_dim, dtype=self.dtype,
                         kernel_init=TORCH_LINEAR_INIT,
                         bias_init=torch_linear_bias_init(D), name="ff1")(x)
            h = nn.relu(h)
            h = nn.Dense(D, dtype=self.dtype, kernel_init=TORCH_LINEAR_INIT,
                         bias_init=torch_linear_bias_init(self.ff_dim),
                         name="ff2")(h)
            out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="norm2")(x + h).astype(self.dtype)
            return out, new_cache
        k_raw, v_raw = k, v                       # (B, L, D) pre-head-split
        from genrec_tpu.kernels.attention import (fused_softmax,
                                                  fused_softmax_supported)
        # hardware A/B (out/tpu_measurements.jsonl 2026-08-19), B=64 2x2
        # matrix: hash-softmax 890 / plain 881 without dedupe, 1116 / 1104
        # with — the chain keeps a consistent ~1% edge at the L=84 decoder
        # shape, so it stays default (GENREC_TPU_NO_FUSED_ATTENTION=1 for
        # the plain-XLA A/B, as everywhere).
        # torch TransformerDecoderLayer passes its dropout into MHA: the
        # attention WEIGHTS are dropped during training (parity, r4)
        attn_rate = 0.0 if deterministic else self.dropout
        if fused_softmax_supported():
            # causal is batch-independent, padding per-key: the fused
            # softmax kernel applies (no (B,H,L,L) fp32 scores in HBM)
            sh = lambda t: t.reshape(B, L, H, Dh)
            s_raw = jnp.einsum("bqhd,bkhd->bhqk", sh(q), sh(k))
            bias = jnp.broadcast_to(
                jnp.where(causal, -1e9, 0.0)[None].astype(jnp.float32),
                (H, L, L))
            kpad = jnp.where(pad_mask, -1e9, 0.0).astype(jnp.float32)
            seed = 0
            if attn_rate > 0.0:
                from genrec_tpu.core.rng import seed_from_rng
                seed = seed_from_rng(self.make_rng("dropout"))
            p = fused_softmax(s_raw, bias, kpad, seed, Dh ** -0.5,
                              rate=attn_rate)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p.astype(self.dtype),
                              sh(v), preferred_element_type=jnp.float32)
            attn = attn.astype(self.dtype).reshape(B, L, D)
        else:
            split = lambda t: t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
            q, k, v = split(q), split(k), split(v)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.float32) * (Dh ** -0.5)
            scores = jnp.where(causal[None, None], -1e9, scores)
            scores = jnp.where(pad_mask[:, None, None, :], -1e9, scores)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = HwDropout(self.dropout)(probs,
                                            deterministic=deterministic)
            attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                              preferred_element_type=jnp.float32)
            attn = attn.astype(self.dtype).transpose(
                0, 2, 1, 3).reshape(B, L, D)
        attn = nn.Dense(D, dtype=self.dtype, kernel_init=TORCH_LINEAR_INIT,
                        name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            x + HwDropout(self.dropout)(attn, deterministic=deterministic)
        ).astype(self.dtype)
        # the reference decoder layer is torch's with EMPTY memory
        # (cobra.py:209-216): the cross-attn sublayer contributes exactly 0,
        # but its post-norm still applies — x = norm2(x + 0). Verified
        # against torch directly; without this extra learned LN the r4
        # head-to-head measured genrec_tpu 2.2x BELOW the reference.
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm_cross")(x).astype(self.dtype)
        h = nn.Dense(self.ff_dim, dtype=self.dtype,
                     kernel_init=TORCH_LINEAR_INIT,
                     bias_init=torch_linear_bias_init(D), name="ff1")(x)
        h = nn.relu(h)
        h = HwDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(D, dtype=self.dtype, kernel_init=TORCH_LINEAR_INIT,
                     bias_init=torch_linear_bias_init(self.ff_dim),
                     name="ff2")(h)
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            x + HwDropout(self.dropout)(h, deterministic=deterministic)
        ).astype(self.dtype)
        if return_kv:
            return out, (k_raw, v_raw)
        return out


@gin.configurable
class Cobra(nn.Module):
    encoder_n_layers: int = 1
    encoder_hidden_dim: int = 768
    encoder_num_heads: int = 8
    encoder_vocab_size: int = 32128
    id_vocab_size: int = 512
    n_codebooks: int = 3
    d_model: int = 768
    max_len: int = 1024
    temperature: float = 0.2
    decoder_n_layers: int = 8
    decoder_num_heads: int = 6
    decoder_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def pad_id(self) -> int:
        return self.id_vocab_size * self.n_codebooks

    def setup(self):
        C, D = self.n_codebooks, self.d_model
        self.encoder = LightTextEncoder(
            n_layers=self.encoder_n_layers,
            hidden_dim=self.encoder_hidden_dim, output_dim=D,
            num_heads=self.encoder_num_heads,
            vocab_size=self.encoder_vocab_size, dtype=self.dtype,
            name="encoder")
        # init parity: the reference CobraEmbedding tables are torch
        # nn.Embedding defaults, N(0, 1) (cobra.py:21-27)
        from genrec_tpu.nn.transformer import (TORCH_LINEAR_INIT,
                                               torch_linear_bias_init)
        n01 = nn.initializers.normal(stddev=1.0)
        self.id_embed = nn.Embed(self.id_vocab_size * C + 1, D,
                                 dtype=self.dtype, embedding_init=n01,
                                 name="id_embed")
        self.type_embed = nn.Embed(2, D, dtype=self.dtype,
                                   embedding_init=n01, name="type_embed")
        self.pos_embed = nn.Embed(self.max_len, D, dtype=self.dtype,
                                  embedding_init=n01, name="pos_embed")
        self.decoder_blocks = [
            CobraDecoderBlock(D, self.decoder_num_heads, 2048,
                              self.decoder_dropout, dtype=self.dtype,
                              name=f"dec_{i}")
            for i in range(self.decoder_n_layers)]
        self.sparse_heads = [
            nn.Dense(self.id_vocab_size, dtype=self.dtype,
                     kernel_init=TORCH_LINEAR_INIT,
                     bias_init=torch_linear_bias_init(D), name=f"head_{c}")
            for c in range(C)]

    # -- embedding interleave (static shapes) ------------------------------
    def _embed_tokens(self, input_ids):
        """Offset + pad-aware id embedding for (B, L) raw code ids."""
        L = input_ids.shape[1]
        types = jnp.arange(L, dtype=jnp.int32) % self.n_codebooks
        is_pad = input_ids == self.pad_id
        offset_ids = jnp.where(is_pad, self.pad_id,
                               input_ids + types[None] * self.id_vocab_size)
        emb = self.id_embed(offset_ids)
        return jnp.where(is_pad[..., None], 0.0, emb)

    def _interleave(self, input_ids, vecs, n_partial: int = 0):
        """Build decoder inputs: [C codes + 1 dense] per item (+ partials).

        Returns (h, pad_mask): (B, T*(C+1)+n_partial, D) and (B, same) where
        pad_mask True = padding.
        """
        B, L = input_ids.shape
        C, D = self.n_codebooks, self.d_model
        T = (L - n_partial) // C
        sparse = self._embed_tokens(input_ids)
        complete = sparse[:, :T * C].reshape(B, T, C, D)
        dense = vecs[:, :T, None, :].astype(self.dtype)
        h = jnp.concatenate([complete, dense], axis=2).reshape(
            B, T * (C + 1), D)
        type_idx = jnp.tile(
            jnp.concatenate([jnp.zeros((C,), jnp.int32),
                             jnp.ones((1,), jnp.int32)]), T)
        pad_sparse = input_ids == self.pad_id                    # (B, L)
        pad_complete = pad_sparse[:, :T * C].reshape(B, T, C)
        pad_dense = pad_complete[:, :, -1:]                      # dense pads
        pad = jnp.concatenate([pad_complete, pad_dense], axis=2).reshape(
            B, T * (C + 1))
        if n_partial:
            h = jnp.concatenate([h, sparse[:, T * C:]], axis=1)
            type_idx = jnp.concatenate(
                [type_idx, jnp.zeros((n_partial,), jnp.int32)])
            pad = jnp.concatenate([pad, pad_sparse[:, T * C:]], axis=1)
        out_len = h.shape[1]
        keep = jnp.logical_not(pad)[..., None].astype(self.dtype)
        h = h * keep
        h = h + self.pos_embed(jnp.arange(out_len)[None]) * keep
        h = h + self.type_embed(type_idx[None]) * keep
        return h, pad

    def _decode(self, h, pad, deterministic: bool = True):
        L = h.shape[1]
        cm = jnp.triu(jnp.ones((L, L), bool), k=1)
        for blk in self.decoder_blocks:
            h = blk(h, pad, cm, deterministic)
        return h

    def _decode_prefill(self, h, pad):
        """History forward that also collects per-layer raw k/v (B, Lh, D)
        for the cached generation path."""
        L = h.shape[1]
        cm = jnp.triu(jnp.ones((L, L), bool), k=1)
        cache = []
        for blk in self.decoder_blocks:
            h, kv = blk(h, pad, cm, True, return_kv=True)
            cache.append(kv)
        return h, cache

    def _decode_step_beams(self, tok_emb, hist_cache, hist_pad, dec_cache,
                           level: int, num_beams: int):
        """One beam level over [history cache ‖ decoded slots].

        ``tok_emb``: (B, K, D) embedded beam tokens (position/type embeds
        already added). Decoded-token k/v live level-major in
        (B, (C−1)·K, D) slots: level c writes [c·K, (c+1)·K). Beam j
        attends non-pad history plus its own slots ≤ level.
        Returns (B, K, D) hidden + the updated dec cache.
        """
        B, K, D = tok_emb.shape
        S = dec_cache[0][0].shape[1]
        hbias = jnp.where(hist_pad[:, None, None, :], -1e9, 0.0)
        hbias = jnp.broadcast_to(
            hbias, (B, 1, K, hist_pad.shape[1])).astype(jnp.float32)
        j = jnp.arange(K)
        slot_level = jnp.arange(S) // K
        slot_beam = jnp.arange(S) % K
        allow = (slot_beam[None, :] == j[:, None]) & \
            (slot_level[None, :] <= level)                    # (K, S)
        dbias = jnp.where(allow, 0.0, -1e9)[None, None].astype(jnp.float32)
        bias = jnp.concatenate(
            [hbias, jnp.broadcast_to(dbias, (B, 1, K, S))], axis=3)
        x = tok_emb
        new_cache = []
        for blk, hkv, dkv in zip(self.decoder_blocks, hist_cache,
                                 dec_cache):
            x, dkv = blk(x, None, None, True, cache_kv=dkv,
                         write_index=level * K, extra_kv=hkv,
                         attn_bias=bias)
            new_cache.append(dkv)
        return x, new_cache

    def encode_text(self, encoder_input_ids, deterministic: bool = True):
        return self.encoder(encoder_input_ids, deterministic=deterministic)

    # -- training ----------------------------------------------------------
    def __call__(self, input_ids, encoder_input_ids,
                 deterministic: bool = True,
                 text_idx=None) -> CobraOutput:
        """``text_idx`` (B, T): gather map when ``encoder_input_ids`` holds
        deduped unique text rows (U, L) — encode once per unique item, then
        ``vecs[text_idx]`` restores (B, T, D). Identical math to encoding
        each duplicate separately (the gather backward sums occurrence
        grads);
        under training dropout the duplicates share one mask draw."""
        C, V = self.n_codebooks, self.id_vocab_size
        B, L = input_ids.shape
        T = L // C
        vecs = self.encode_text(encoder_input_ids, deterministic)
        if text_idx is not None:
            vecs = jnp.take(vecs, text_idx, axis=0)
        h, pad = self._interleave(input_ids, vecs)
        h = self._decode(h, pad, deterministic)

        n_pos = T - 1
        loss_sparse = 0.0
        total_correct = total_top5 = total_tokens = 0.0
        all_item_correct = jnp.ones((B, n_pos), bool)
        item_pos = jnp.arange(1, T)
        first_valid = None
        for c in range(C):
            if c == 0:
                pos_c = jnp.arange(0, T - 1) * (C + 1) + C     # v_t positions
                target = input_ids[:, item_pos * C]
            else:
                pos_c = item_pos * (C + 1) + (c - 1)
                target = input_ids[:, item_pos * C + c]
            logits = self.sparse_heads[c](h[:, pos_c, :]).astype(jnp.float32)
            valid = target != self.pad_id
            if first_valid is None:
                first_valid = valid
            logp = jax.nn.log_softmax(logits, axis=-1)
            safe_t = jnp.where(valid, target, 0)
            tl = jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
            denom = jnp.maximum(valid.sum(), 1)
            loss_sparse = loss_sparse + (-(tl * valid).sum() / denom)

            pred = jnp.argmax(logits, axis=-1)
            top1 = (pred == target) & valid
            top5_vals = jax.lax.top_k(logits, 5)[1]
            top5 = jnp.any(top5_vals == target[..., None], axis=-1) & valid
            total_correct += top1.sum()
            total_top5 += top5.sum()
            total_tokens += valid.sum()
            all_item_correct &= (pred == target) | jnp.logical_not(valid)
        loss_sparse = loss_sparse / C

        item_ok = all_item_correct & first_valid
        recall_correct = item_ok.sum()
        recall_total = jnp.maximum(first_valid.sum(), 1)

        # dense InfoNCE: predict v_{t+1} from e_{t+1}^{C-1} position
        vec_pos = item_pos * (C + 1) + (C - 1)
        vec_pred = h[:, vec_pos, :].astype(jnp.float32)          # (B, T-1, D)
        vec_gt = jax.lax.stop_gradient(vecs[:, 1:, :]).astype(jnp.float32)
        valid_dense = jnp.logical_not(
            pad[:, (C + 1)::(C + 1)])[:, :n_pos]                 # (B, T-1)
        Q = B * n_pos
        vp = l2norm(vec_pred.reshape(Q, -1))
        vg = l2norm(vec_gt.reshape(Q, -1))
        vmask = valid_dense.reshape(Q)
        seq_ids = jnp.repeat(jnp.arange(B), n_pos)
        same_seq = (seq_ids[None, :] == seq_ids[:, None]) & \
            jnp.logical_not(jnp.eye(Q, dtype=bool))
        sim = (vp @ vg.T) / self.temperature
        sim = jnp.where(same_seq, -1e4, sim)
        # invalid columns can never be positives of valid rows; mask them
        sim = jnp.where(vmask[None, :] | jnp.eye(Q, dtype=bool), sim, -1e4)
        logp_rows = jax.nn.log_softmax(sim, axis=-1)
        row_loss = -jnp.diagonal(logp_rows)
        loss_dense = (row_loss * vmask).sum() / jnp.maximum(vmask.sum(), 1)

        cos = jnp.sum(vp * vg, axis=-1)
        vec_cos_sim = (cos * vmask).sum() / jnp.maximum(vmask.sum(), 1)

        usage = jnp.stack([
            jnp.zeros((self.pad_id + 1,), jnp.float32).at[
                input_ids[:, c::C].reshape(-1)].add(1.0)
            for c in range(C)])
        prob = usage / jnp.maximum(usage.sum(1, keepdims=True), 1e-12)
        entropy = -(prob * jnp.log(prob + 1e-12)).sum(1).mean()

        return CobraOutput(
            loss=loss_sparse + loss_dense, loss_sparse=loss_sparse,
            loss_dense=loss_dense, acc_correct=total_correct,
            acc_total=total_tokens, recall_correct=recall_correct,
            recall_total=recall_total, vec_cos_sim=vec_cos_sim,
            codebook_entropy=entropy)

    # -- generation --------------------------------------------------------
    def generate(self, input_ids, encoder_input_ids, n_candidates: int = 10,
                 temperature: float = 1.0,
                 text_idx=None) -> CobraGenerationOutput:
        C, V, K = self.n_codebooks, self.id_vocab_size, n_candidates
        B, L = input_ids.shape
        vecs = self.encode_text(encoder_input_ids, deterministic=True)
        if text_idx is not None:
            vecs = jnp.take(vecs, text_idx, axis=0)
        T = vecs.shape[1]

        def run(ids, vv, n_partial):
            h, pad = self._interleave(ids, vv, n_partial=n_partial)
            h = self._decode(h, pad, deterministic=True)
            if n_partial > 0:
                # the appended partial codes live at the literal END of the
                # interleaved layout — AFTER any history pad block. The
                # reference reads position (valid_count − 1) instead
                # (cobra.py:620-623), which for rows shorter than the padded
                # length lands on a mid-pad slot whose causal attention
                # cannot see the beam's own prefix — measured as beam
                # dense-vec cos 1.0000 (total beam collapse, flat
                # R@1=R@5=R@10) under our always-padded static batches,
                # 0.88 under the reference's per-batch-max collate (only
                # its short rows are broken). Index the true position:
                # strictly more correct than the reference; the interop
                # test pins exact equality on full-length rows where both
                # agree.
                T_items = vv.shape[1]
                idx = T_items * (self.n_codebooks + 1) + n_partial - 1
                last = h[:, idx]
            else:
                # dense slot of the last VALID item (items are contiguous
                # from the front): (n_valid − 1)·(C+1) + C
                C = self.n_codebooks
                first_codes = ids[:, ::C]
                n_valid = jnp.sum((first_codes != self.pad_id).astype(
                    jnp.int32), axis=1)
                idx = jnp.maximum(n_valid, 1) * (C + 1) - 1
                last = h[jnp.arange(h.shape[0]), idx]
            return last

        beam_seqs = None
        beam_scores = None
        h_last = None
        for c in range(C):
            if c == 0:
                last = run(input_ids, vecs, 0)                   # (B, D)
                logits = self.sparse_heads[0](last).astype(
                    jnp.float32) / temperature
                logp = jax.nn.log_softmax(logits, axis=-1)
                beam_scores, beam_seqs = jax.lax.top_k(logp, K)  # (B, K)
                beam_seqs = beam_seqs[..., None]                 # (B, K, 1)
                if C == 1:
                    h_last = jnp.broadcast_to(last[:, None, :],
                                              (B, K, last.shape[-1]))
            else:
                flat_ids = jnp.concatenate([
                    jnp.repeat(input_ids, K, axis=0),
                    beam_seqs.reshape(B * K, c)], axis=1)
                flat_vecs = jnp.repeat(vecs, K, axis=0)
                last = run(flat_ids, flat_vecs, c)               # (B*K, D)
                logits = self.sparse_heads[c](last).astype(
                    jnp.float32) / temperature
                logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
                combined = (beam_scores[..., None] + logp).reshape(B, K * V)
                beam_scores, idx = jax.lax.top_k(combined, K)
                parent = idx // V
                token = idx % V
                beam_seqs = jnp.take_along_axis(
                    beam_seqs, parent[..., None], axis=1)
                beam_seqs = jnp.concatenate(
                    [beam_seqs, token[..., None]], axis=2)
                if c == C - 1:
                    h_resh = last.reshape(B, K, -1)
                    h_last = jnp.take_along_axis(
                        h_resh, parent[..., None], axis=1)
        return CobraGenerationOutput(
            sem_ids=beam_seqs, dense_vecs=l2norm(h_last.astype(jnp.float32)),
            scores=beam_scores)

    def generate_cached(self, input_ids, encoder_input_ids,
                        n_candidates: int = 10, temperature: float = 1.0,
                        text_idx=None) -> CobraGenerationOutput:
        """KV-cached cascade generation — same outputs as :meth:`generate`
        (the oracle test pins exact sem_ids / allclose scores), but the
        interleaved history runs through the decoder ONCE per batch
        (prefill collects per-layer k/v at batch B) and each level decodes
        only the K beam tokens as beam-blocked queries over
        [history ‖ own decoded slots] — the full-context re-forward per
        level per beam (the dominant eval/serving FLOP term, ~C·K× the
        prefill) is gone."""
        C, V, K = self.n_codebooks, self.id_vocab_size, n_candidates
        B, L = input_ids.shape
        T = L // C
        D = self.d_model
        vecs = self.encode_text(encoder_input_ids, deterministic=True)
        if text_idx is not None:
            vecs = jnp.take(vecs, text_idx, axis=0)

        h0, pad = self._interleave(input_ids, vecs)
        h_hist, hist_cache = self._decode_prefill(h0, pad)

        # level-0 read: dense slot of the last VALID item
        first_codes = input_ids[:, ::C]
        n_valid = jnp.sum((first_codes != self.pad_id).astype(jnp.int32),
                          axis=1)
        idx0 = jnp.maximum(n_valid, 1) * (C + 1) - 1
        last = h_hist[jnp.arange(B), idx0]                      # (B, D)

        n_slots = max(C - 1, 1) * K
        zeros = jnp.zeros((B, n_slots, D), self.dtype)
        dec_cache = [(zeros, zeros) for _ in self.decoder_blocks]

        def embed_partial(tok, c):
            """(B, K) level-c code ids → (B, K, D) decoder inputs."""
            emb = self.id_embed(tok + c * V).astype(self.dtype)
            pos = jnp.full((1, 1), T * (C + 1) + c, jnp.int32)
            return emb + self.pos_embed(pos) + self.type_embed(
                jnp.zeros((1, 1), jnp.int32))

        beam_seqs = None
        beam_scores = None
        h_last = None
        for c in range(C):
            if c == 0:
                logits = self.sparse_heads[0](last).astype(
                    jnp.float32) / temperature
                logp = jax.nn.log_softmax(logits, axis=-1)
                beam_scores, tok = jax.lax.top_k(logp, K)       # (B, K)
                beam_seqs = tok[..., None]                      # (B, K, 1)
                if C == 1:
                    h_last = jnp.broadcast_to(last[:, None, :], (B, K, D))
                    break
                # decode the level-0 tokens into slot 0 (beams share the
                # history; no re-home needed — dec cache is empty)
                x, dec_cache = self._decode_step_beams(
                    embed_partial(tok, 0), hist_cache, pad, dec_cache,
                    0, K)
            else:
                logits = self.sparse_heads[c](x).astype(
                    jnp.float32) / temperature                  # (B, K, V)
                logp = jax.nn.log_softmax(logits, axis=-1)
                combined = (beam_scores[..., None] + logp).reshape(B, K * V)
                beam_scores, idx = jax.lax.top_k(combined, K)
                parent = idx // V
                token = idx % V
                beam_seqs = jnp.take_along_axis(
                    beam_seqs, parent[..., None], axis=1)
                beam_seqs = jnp.concatenate(
                    [beam_seqs, token[..., None]], axis=2)
                if c == C - 1:
                    h_last = jnp.take_along_axis(
                        x, parent[..., None], axis=1)
                    break
                # re-home decoded slots onto the parents, then decode the
                # chosen level-c tokens into slot c
                sl = jnp.arange(n_slots)
                gidx = (sl // K) * K + parent[:, sl % K]        # (B, S)
                gat = lambda t: jnp.take_along_axis(
                    t, gidx[..., None], axis=1)
                dec_cache = [(gat(kd), gat(vd)) for kd, vd in dec_cache]
                x, dec_cache = self._decode_step_beams(
                    embed_partial(token, c), hist_cache, pad, dec_cache,
                    c, K)
        return CobraGenerationOutput(
            sem_ids=beam_seqs, dense_vecs=l2norm(h_last.astype(jnp.float32)),
            scores=beam_scores)

    def generate_itemvec(self, encoder_input_ids):
        return l2norm(self.encode_text(encoder_input_ids,
                                       deterministic=True))


import functools


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("n_candidates", "n_beam", "temperature",
                                    "alpha"))
def beam_fusion(model: Cobra, params, input_ids, encoder_input_ids,
                item_dense_vecs, item_sem_ids, n_candidates: int = 10,
                n_beam: int = 50, temperature: float = 1.0,
                alpha: float = 0.5, text_idx=None) -> BeamFusionOutput:
    """Beam search + dense nearest-neighbour fusion (reference cobra.py:679-760).

    jit-compiled end to end (r4): the eval path previously dispatched
    op-by-op — each (prefix-length) decoder re-run, the (B·K, N) similarity
    matmul and the fusion top-k now fuse into one XLA program per batch
    shape (model/int knobs are static; varying text-dedupe row buckets just
    add a handful of compile-cache entries).

    r5: the cascade runs KV-cached by default (history prefill once at
    batch B, per-level beam-token decode — ``Cobra.generate_cached``);
    ``GENREC_TPU_NO_COBRA_CACHED_GENERATE=1`` keeps the full-re-forward
    layout as the A/B oracle (test pins identical outputs)."""
    import os
    cached = os.environ.get("GENREC_TPU_NO_COBRA_CACHED_GENERATE",
                            "") in ("", "0")
    gen = model.apply({"params": params}, input_ids, encoder_input_ids,
                      n_candidates=n_beam, temperature=temperature,
                      text_idx=text_idx,
                      method=Cobra.generate_cached if cached
                      else Cobra.generate)
    items = l2norm(jnp.asarray(item_dense_vecs, jnp.float32))
    sim = jnp.einsum("bkd,nd->bkn", gen.dense_vecs, items)
    max_sim = jnp.max(sim, axis=-1)
    best_item = jnp.argmax(sim, axis=-1)                          # (B, n_beam)
    beam_norm = jax.nn.softmax(gen.scores, axis=-1)
    fused = alpha * beam_norm + (1 - alpha) * (max_sim + 1.0) / 2.0
    top_scores, top_idx = jax.lax.top_k(fused, n_candidates)
    top_items = jnp.take_along_axis(best_item, top_idx, axis=1)
    top_sem = jnp.asarray(item_sem_ids)[top_items]
    return BeamFusionOutput(item_ids=top_items, sem_ids=top_sem,
                            scores=top_scores)
