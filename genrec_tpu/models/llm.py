"""Decoder-only causal LM backbone (Qwen2-style) for LCRec/NoteLLM (Flax).

The reference wraps HF ``AutoModelForCausalLM`` with Qwen2.5-1.5B weights
(``/root/reference/genrec/models/lcrec.py:17-60``). This environment has no
model downloads, so LCRec here runs on an in-repo TPU-native backbone with the
same architecture family: RMSNorm pre-norm, rotary position embeddings,
grouped-query attention, SwiGLU MLP, optional weight tying — randomly
initialized by default, with an embedding-resize hook for the ``<Ci_j>``
token surgery (reference lcrec.py:48-60).

TPU-first notes: fixed max_len causal mask, fp32 softmax, bf16-able matmuls.
Generation uses a KV cache (``prefill`` + ``decode_step``): the prompt is
encoded once into per-layer (B, KV, Lc, Dh) caches and each generated token
runs a single-position forward against them — the HF ``use_cache=True``
contract (``/root/reference/genrec/trainers/lcrec_trainer.py:146``) rebuilt
as two jit-compiled entry points with static cache length.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.configlib import gin


def rope(x: jnp.ndarray, positions: jnp.ndarray,
         base: float = 10000.0) -> jnp.ndarray:
    """Rotary embedding over the last dim of (B, H, L, Dh)."""
    Dh = x.shape[-1]
    half = Dh // 2
    freqs = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[:, None, :, None].astype(jnp.float32) * \
        freqs[None, None, None, :]                       # (B, 1, L, half)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half:]
    rx1 = x1 * cos - x2 * sin
    rx2 = x2 * cos + x1 * sin
    return jnp.concatenate([rx1, rx2], axis=-1).astype(x.dtype)


class LoraDense(nn.Module):
    """Dense with an additive low-rank adapter: ``W x + (B A) x · α/r``.

    Parity with the reference's peft-LoRA on qkvo+MLP projections
    (``trainers/lcrec_trainer.py:306-315``). The base kernel trains too
    unless the optimizer masks it — see :func:`lora_param_mask`.
    """
    features: int
    rank: int
    alpha: float = 16.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="base")(x)
        a = self.param("lora_a", nn.initializers.normal(stddev=0.02),
                       (x.shape[-1], self.rank))
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features))
        scale = self.alpha / self.rank
        return y + (x @ a.astype(self.dtype)) @ b.astype(self.dtype) * scale


def lora_param_mask(params) -> dict:
    """True for LoRA params (and nothing else) — feed to ``optax.masked`` to
    freeze the base weights (peft parity: only adapters train)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            str(getattr(p, "key", "")) in ("lora_a", "lora_b")
            for p in path),
        params)


def lora_label_fn(params) -> dict:
    """'train'/'freeze' labels for ``optax.multi_transform``; raises if no
    LoRA params exist (use_lora with lora_rank=0 would silently freeze
    everything otherwise)."""
    mask = lora_param_mask(params)
    if not any(jax.tree_util.tree_leaves(mask)):
        raise ValueError("LoRA freezing requested but the model has no "
                         "lora_a/lora_b params (is lora_rank > 0?)")
    return jax.tree_util.tree_map(
        lambda is_lora: "train" if is_lora else "freeze", mask)


class LlmBlock(nn.Module):
    d_model: int
    n_heads: int
    n_kv_heads: int
    ff_dim: int
    lora_rank: int = 0
    lora_alpha: float = 16.0
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32
    # optional attention override (cacheless path): called as
    # attn_impl(q, k, v, kpad_add) on post-rope, post-GQA-repeat tensors;
    # must implement scaling + causal masking itself. Used by the
    # sequence-parallel ring executor (parallel/ring.py). Adds no params.
    attn_impl: Optional[Callable] = None

    def _dense(self, feats, name, use_bias=False):
        if self.lora_rank > 0:
            return LoraDense(feats, rank=self.lora_rank,
                             alpha=self.lora_alpha, use_bias=use_bias,
                             dtype=self.dtype, name=name)
        return nn.Dense(feats, use_bias=use_bias, dtype=self.dtype,
                        name=name)

    @nn.compact
    def __call__(self, x, positions, attn_bias, cache_kv=None,
                 write_index: int = 0, fused_mask=None, extra_kv=None):
        """Returns ``(x_out, new_cache_kv)``.

        ``extra_kv=(pk, pv)``: read-only (B, KV, Lp, Dh) key/value prefix
        (a shared prompt cache) PREPENDED to the cached keys at attention
        time — it is never written or re-homed, so beam search keeps the
        prompt KV at batch B while only the tiny decoded-token cache is
        beam-managed (see CausalLM.decode_step_beams). ``attn_bias`` must
        then cover key length Lp + Lc.

        Without a cache this is the plain causal block (``new_cache_kv`` is
        None). With ``cache_kv=(k_cache, v_cache)`` of shape
        (B, KV, Lc, Dh), the current positions' roped k/v are written at
        ``write_index`` and attention runs over the full cache —
        ``attn_bias`` must then have key length Lc and mask unwritten slots.

        ``fused_mask=(causal_2d (L,L), kpad_add (B,L))``: the mask split
        into a batch-independent and a per-key part — enables the fused
        softmax TPU kernel (no (B,H,L,L) fp32 score tensor in HBM) on the
        cacheless path.
        """
        from genrec_tpu.nn.normalize import RMSNorm
        B, L, D = x.shape
        H, KV = self.n_heads, self.n_kv_heads
        Dh = D // H
        h = RMSNorm(D, name="attn_norm")(x)
        q = self._dense(H * Dh, "q", use_bias=True)(h)
        k = self._dense(KV * Dh, "k", use_bias=True)(h)
        v = self._dense(KV * Dh, "v", use_bias=True)(h)
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, KV, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, KV, Dh).transpose(0, 2, 1, 3)
        q = rope(q, positions, base=self.rope_theta)
        k = rope(k, positions, base=self.rope_theta)
        new_cache = None
        if cache_kv is not None:
            k_cache, v_cache = cache_kv
            k = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype),
                                             (0, 0, write_index, 0))
            v = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype),
                                             (0, 0, write_index, 0))
            new_cache = (k, v)
        if extra_kv is not None:
            pk, pv = extra_kv
            k = jnp.concatenate([pk.astype(k.dtype), k], axis=2)
            v = jnp.concatenate([pv.astype(v.dtype), v], axis=2)
        if KV != H:
            rep = H // KV
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        from genrec_tpu.kernels.attention import (fused_softmax,
                                                  fused_softmax_supported)
        if cache_kv is None and self.attn_impl is not None:
            out = self.attn_impl(q, k, v, fused_mask[1]).astype(self.dtype)
        else:
            if cache_kv is None and fused_mask is not None \
                    and fused_softmax_supported():
                causal2d, kpad_add = fused_mask
                s_raw = jnp.einsum("bhqd,bhkd->bhqk", q, k)
                bias = jnp.broadcast_to(causal2d[None].astype(jnp.float32),
                                        (H, L, L))
                attn = fused_softmax(s_raw, bias, kpad_add, 0,
                                     Dh ** -0.5).astype(self.dtype)
            else:
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32) * (Dh ** -0.5)
                scores = scores + attn_bias
                attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", attn, v,
                preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + self._dense(D, "o")(out)

        h = RMSNorm(D, name="mlp_norm")(x)
        gate = self._dense(self.ff_dim, "gate")(h)
        up = self._dense(self.ff_dim, "up")(h)
        down = self._dense(D, "down")(nn.silu(gate) * up)
        return x + down, new_cache


class _HeadKernel(nn.Module):
    """Raw (D, V) kernel at the same tree path/init as the nn.Dense head it
    replaces, so checkpoints are interchangeable; exposing the array lets
    the fused CE consume it without materialising logits."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class CausalLMOutput(NamedTuple):
    logits: Optional[jnp.ndarray]
    loss: Optional[jnp.ndarray]


def causal_lm_fused_ce(model: "CausalLM", x: jnp.ndarray,
                       labels: jnp.ndarray, wte: jnp.ndarray,
                       lm_head_kernel: Optional[jnp.ndarray]) -> jnp.ndarray:
    """The shift + chunked linear+CE tail shared by ``CausalLM.__call__``
    and the PP/SP executors (parallel/pipeline.py, parallel/ring.py) —
    one definition so the three paths cannot silently diverge."""
    from genrec_tpu.ops.fused_ce import fused_linear_cross_entropy
    D = x.shape[-1]
    xs = x[:, :-1, :].reshape(-1, D)
    ls = labels[:, 1:].reshape(-1)
    chunk = min(model.fused_ce_chunk,
                max(128, -(-model.vocab_size // 128) * 128))
    if model.tie_embeddings:
        return fused_linear_cross_entropy(xs, wte, ls, -100, chunk, True)
    return fused_linear_cross_entropy(xs, lm_head_kernel, ls, -100, chunk,
                                      False)


@gin.configurable
class CausalLM(nn.Module):
    """Small Qwen2-family causal LM. ``labels == -100`` are ignored
    (HF convention, reference lcrec_trainer.py:43-84 prompt masking)."""
    vocab_size: int = 32000
    d_model: int = 512
    n_layers: int = 8
    n_heads: int = 8
    n_kv_heads: int = 4
    ff_dim: int = 1408
    max_len: int = 1024
    rope_theta: float = 10000.0
    tie_embeddings: bool = True
    remat: bool = False   # rematerialize blocks: trade FLOPs for HBM
    lora_rank: int = 0    # >0: low-rank adapters on every projection
    lora_alpha: float = 16.0
    fused_ce: bool = True       # chunked loss, no (B, L, V) logits in HBM
    fused_ce_chunk: int = 4096  # vocab chunk size for the fused loss
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from genrec_tpu.nn.normalize import RMSNorm
        self.wte = self.param("wte", nn.initializers.normal(stddev=0.02),
                              (self.vocab_size, self.d_model))
        block_cls = nn.remat(LlmBlock) if self.remat else LlmBlock
        self.blocks = [
            block_cls(self.d_model, self.n_heads, self.n_kv_heads,
                      self.ff_dim, lora_rank=self.lora_rank,
                      lora_alpha=self.lora_alpha,
                      rope_theta=self.rope_theta,
                      dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.n_layers)]
        self.final_norm = RMSNorm(self.d_model, name="final_norm")
        if not self.tie_embeddings:
            self.lm_head = _HeadKernel((self.d_model, self.vocab_size),
                                       name="lm_head")

    def hidden_states(self, input_ids: jnp.ndarray,
                      attention_mask: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
        """(B, L, D) final-norm hidden states (for embedding extraction)."""
        B, L = input_ids.shape
        x = jnp.take(self.wte, input_ids, axis=0).astype(self.dtype)

        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        # left-padding aware positions: first real token gets position 0
        positions = jnp.cumsum(attention_mask, axis=1) - 1
        positions = jnp.maximum(positions, 0)

        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)
        kpad_add = jnp.where(attention_mask == 0, -1e9,
                             0.0).astype(jnp.float32)          # (B, L)
        bias = causal[None, None] + kpad_add[:, None, None, :]

        for blk in self.blocks:
            x, _ = blk(x, positions, bias,
                       fused_mask=(causal, kpad_add))
        return self.final_norm(x)

    def _lm_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tie_embeddings:
            logits = jnp.einsum("bld,vd->blv", x,
                                self.wte.astype(self.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(x, self.lm_head().astype(self.dtype))
        return logits.astype(jnp.float32)

    # -- KV-cache generation entry points ---------------------------------
    def prefill(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                cache_len: int):
        """Encode the prompt once, filling per-layer KV caches.

        Returns ``(last_logits (B, V), cache, cache_mask (B, Lc),
        next_position (B,))`` — the state a :meth:`decode_step` chain
        continues from. ``cache_len`` must be ≥ L + number of tokens to
        generate (static, so the whole decode compiles once).
        """
        B, L = input_ids.shape
        KV, Dh = self.n_kv_heads, self.d_model // self.n_heads
        x = jnp.take(self.wte, input_ids, axis=0).astype(self.dtype)
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)

        # (L, Lc) bias: causal over the first L cache columns, -inf beyond
        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)
        future = jnp.full((L, cache_len - L), -1e9, jnp.float32)
        bias = jnp.concatenate([causal, future], axis=1)[None, None]
        pad = jnp.where(attention_mask[:, None, None, :] == 0, -1e9, 0.0)
        bias = bias + jnp.pad(pad, ((0, 0), (0, 0), (0, 0),
                                    (0, cache_len - L)))

        empty = jnp.zeros((B, KV, cache_len, Dh), self.dtype)
        cache = []
        for blk in self.blocks:
            x, kv = blk(x, positions, bias, cache_kv=(empty, empty),
                        write_index=0)
            cache.append(kv)
        last = self.final_norm(x)[:, -1:, :]
        logits = self._lm_logits(last)[:, 0, :]
        cache_mask = jnp.pad(attention_mask.astype(jnp.int32),
                             ((0, 0), (0, cache_len - L)))
        next_position = jnp.sum(attention_mask, axis=1).astype(jnp.int32)
        return logits, cache, cache_mask, next_position

    def extend(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
               cache, cache_mask: jnp.ndarray, prompt_len: int):
        """Multi-token forward over an existing prompt cache.

        The shared-prompt reuse the reference implements as a custom HF
        ``DynamicCache`` broadcast across the batch
        (``/root/reference/genrec/models/notellm.py:20-41,144-156``): the
        prompt prefix's KV is computed ONCE and every suffix row attends
        over it plus its own causal suffix. ``cache`` holds per-layer
        (B, KV, Lc, Dh) tensors with the first ``prompt_len`` slots
        written (``cache_mask`` marks valid prompt slots); the suffix
        ``input_ids`` (B, L) writes slots [prompt_len, prompt_len+L).

        Returns (B, L, D) final-norm hidden states and the updated cache.
        """
        B, L = input_ids.shape
        x = jnp.take(self.wte, input_ids, axis=0).astype(self.dtype)
        positions = prompt_len + jnp.maximum(
            jnp.cumsum(attention_mask, axis=1) - 1, 0)

        Lc = cache_mask.shape[1]
        # key layout: [0, prompt_len) prompt slots, [prompt_len,
        # prompt_len+L) own suffix (causal), beyond = unwritten
        k_idx = jnp.arange(Lc)[None, :]                      # (1, Lc)
        q_idx = jnp.arange(L)[:, None]                       # (L, 1)
        is_prompt = (k_idx < prompt_len)[None]               # (1, L?, Lc) b'cast
        causal_suffix = (k_idx >= prompt_len) & \
            (k_idx - prompt_len <= q_idx)                    # (L, Lc)
        suffix_valid = jnp.pad(attention_mask.astype(bool),
                               ((0, 0), (prompt_len, Lc - prompt_len - L)))
        visible = (is_prompt & cache_mask[:, None, :].astype(bool)) | \
            (causal_suffix[None] & suffix_valid[:, None, :])
        bias = jnp.where(visible[:, None], 0.0, -1e9).astype(jnp.float32)

        new_cache = []
        for blk, kv in zip(self.blocks, cache):
            x, kv = blk(x, positions, bias, cache_kv=kv,
                        write_index=prompt_len)
            new_cache.append(kv)
        return self.final_norm(x), new_cache

    def decode_step(self, token_ids: jnp.ndarray, position: jnp.ndarray,
                    cache, cache_mask: jnp.ndarray, write_index: int):
        """One generation step: ``token_ids`` (B, 1) attends over the cache.

        Returns ``(logits (B, V), new_cache, new_cache_mask)``. The new
        token's k/v are written at ``write_index`` (static int — levels are
        unrolled in the callers), and it attends to every valid cache slot
        including itself.
        """
        B = token_ids.shape[0]
        x = jnp.take(self.wte, token_ids, axis=0).astype(self.dtype)
        cache_mask = cache_mask.at[:, write_index].set(1)
        bias = jnp.where(cache_mask[:, None, None, :] == 0, -1e9, 0.0)
        positions = position.reshape(B, 1)
        new_cache = []
        for blk, kv in zip(self.blocks, cache):
            x, kv = blk(x, positions, bias, cache_kv=kv,
                        write_index=write_index)
            new_cache.append(kv)
        last = self.final_norm(x)
        logits = self._lm_logits(last)[:, 0, :]
        return logits, new_cache, cache_mask

    def decode_step_beams(self, token_ids: jnp.ndarray,
                          position: jnp.ndarray, prompt_cache,
                          prompt_mask: jnp.ndarray, dec_cache,
                          level: int, num_beams: int):
        """One beam-search level with a SHARED prompt cache (batch B).

        The K beams of a batch row decode as K query positions of one
        sequence: ``token_ids``/``position`` are (B, K). ``prompt_cache``
        is the per-layer (B, KV, Lp, Dh) prefill output — read-only, never
        expanded to B·K. ``dec_cache`` holds only the decoded tokens'
        K/V in level-major slots (B, KV, C·K, Dh): level c writes the
        contiguous slice [c·K, (c+1)·K), so beam re-homing is a gather
        over C·K slots (~1 MB) instead of the full B·K-row cache copy the
        r4 path paid per level (~190 MB/layer at the serving bench shape).

        Beam j attends the prompt plus slots {c'·K + j : c' ≤ level}.
        Returns ``(logits (B, K, V), new_dec_cache)``.
        """
        B, K = token_ids.shape
        CK = dec_cache[0][0].shape[2]
        Lp = prompt_mask.shape[1]
        x = jnp.take(self.wte, token_ids, axis=0).astype(self.dtype)

        pbias = jnp.where(prompt_mask[:, None, None, :] == 0, -1e9, 0.0)
        pbias = jnp.broadcast_to(pbias, (B, 1, K, Lp)).astype(jnp.float32)
        j = jnp.arange(K)
        slot_level = jnp.arange(CK) // K
        slot_beam = jnp.arange(CK) % K
        allow = (slot_beam[None, :] == j[:, None]) & \
            (slot_level[None, :] <= level)                  # (K, CK)
        dbias = jnp.where(allow, 0.0, -1e9)[None, None].astype(jnp.float32)
        bias = jnp.concatenate(
            [pbias, jnp.broadcast_to(dbias, (B, 1, K, CK))], axis=3)

        new_dec = []
        for blk, pkv, kv in zip(self.blocks, prompt_cache, dec_cache):
            x, kv = blk(x, position, bias, cache_kv=kv,
                        write_index=level * K, extra_kv=pkv)
            new_dec.append(kv)
        last = self.final_norm(x)
        return self._lm_logits(last), new_dec

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 labels: Optional[jnp.ndarray] = None) -> CausalLMOutput:
        x = self.hidden_states(input_ids, attention_mask)

        if labels is not None and self.fused_ce:
            # chunked linear+CE: the (B, L, V) logits/log-softmax pair never
            # materialises (HBM traffic is the SFT-step bound at real vocab
            # sizes); training call sites consume only ``loss``
            loss = causal_lm_fused_ce(
                self, x, labels, self.wte,
                None if self.tie_embeddings else self.lm_head())
            return CausalLMOutput(logits=None, loss=loss)

        logits = self._lm_logits(x)
        loss = None
        if labels is not None:
            shift_logits = logits[:, :-1]
            shift_labels = labels[:, 1:]
            keep = shift_labels != -100
            safe = jnp.where(keep, shift_labels, 0)
            logp = jax.nn.log_softmax(shift_logits, axis=-1)
            tl = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            loss = -(tl * keep).sum() / jnp.maximum(keep.sum(), 1)
        return CausalLMOutput(logits=logits, loss=loss)


def resize_token_embeddings(params: dict, new_vocab: int,
                            rng: jax.Array) -> dict:
    """Grow the embedding table (the ``<Ci_j>`` surgery; ref lcrec.py:48-60)."""
    import flax
    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(
        params)
    wte = p["wte"]
    old_vocab, d = wte.shape
    if new_vocab <= old_vocab:
        return params
    extra = jax.random.normal(rng, (new_vocab - old_vocab, d),
                              dtype=wte.dtype) * 0.02
    p = dict(p)
    p["wte"] = jnp.concatenate([wte, extra], axis=0)
    return p
