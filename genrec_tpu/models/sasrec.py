"""SASRec: self-attentive sequential recommendation (Flax).

Parity target: ``/root/reference/genrec/models/sasrec.py`` — a faithful port
of the official TF implementation's quirks: item embedding scaled by √d with
padding row 0 (:100-107), learned positions added unscaled (:108-110), padding
zeroed after embedding dropout and after **every** block (:113-117),
Q-from-normed / K,V-from-raw attention with key-mask *pre*-softmax and
query-mask *post*-softmax, residual added inside attention to the *normed*
query (:168-246), FFN with residual inside (:249-266), final LayerNorm, logits
as a dot with the item-embedding table (:121), CE with ``ignore_index=0`` over
all positions (:124-129), and ``predict`` = top-k of last-position logits with
the pad id masked (:132-139).

TPU-first notes: the whole forward is one fused XLA program; the (B, L, V)
logits matmul is the MXU hot spot and runs in bf16 with fp32 accumulation;
eval-time full-catalog scoring avoids materialising (B, L, V) by scoring only
the last position.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.nn.dropout import Dropout as HwDropout

from genrec_tpu.configlib import gin

NEG_INF = -1e9

# Weight-init parity: the reference xavier_uniform-initializes every
# nn.Linear weight (zero bias) and both embeddings
# (/root/reference/genrec/models/sasrec.py:64-76); Flax Dense's default is
# lecun_normal, a different distribution and scale.
_REF_INIT = nn.initializers.xavier_uniform()


class SASRecOutput(NamedTuple):
    logits: Optional[jnp.ndarray]
    loss: Optional[jnp.ndarray]


class SASRecBlockAttention(nn.Module):
    """Official-impl attention: query mask post-softmax, residual inside."""
    embed_dim: int
    num_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key_value, mask, deterministic: bool = True):
        B, L, _ = query.shape
        H, Dh = self.num_heads, self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=_REF_INIT, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=_REF_INIT, name="k_proj")(key_value)
        v = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=_REF_INIT, name="v_proj")(key_value)
        split = lambda t: t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        valid = mask[..., 0]                                   # (B, L) float
        scores = jnp.where(valid[:, None, None, :] == 0, NEG_INF, scores)
        causal = jnp.triu(jnp.ones((L, L), bool), k=1)
        scores = jnp.where(causal[None, None], NEG_INF, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = attn * valid[:, None, :, None]                  # query mask
        attn = HwDropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.embed_dim)
        return out + query   # residual to the normed query (official quirk)


class PointWiseFeedForward(nn.Module):
    embed_dim: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual, deterministic: bool = True):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     kernel_init=_REF_INIT, name="fc1")(x)
        h = nn.relu(h)
        h = HwDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=_REF_INIT, name="fc2")(h)
        h = HwDropout(self.dropout)(h, deterministic=deterministic)
        return h + residual


class SASRecBlock(nn.Module):
    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        normed = nn.LayerNorm(epsilon=1e-8, dtype=self.dtype, name="norm1")(x)
        x = SASRecBlockAttention(
            self.embed_dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="attention")(normed, x, mask, deterministic)
        normed = nn.LayerNorm(epsilon=1e-8, dtype=self.dtype, name="norm2")(x)
        return PointWiseFeedForward(
            self.embed_dim, self.ffn_dim, self.dropout, dtype=self.dtype,
            name="ffn")(normed, x, deterministic)


@gin.configurable
class SASRec(nn.Module):
    num_items: int = 10000
    max_seq_len: int = 50
    embed_dim: int = 64
    num_heads: int = 2
    num_blocks: int = 2
    ffn_dim: int = 256
    dropout: float = 0.2
    fused_ce: bool = True   # chunked loss: no (B, L, V) logits in HBM
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.item_embedding = self.param(
            "item_embedding", nn.initializers.xavier_uniform(),
            (self.num_items + 1, self.embed_dim))
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.xavier_uniform(),
            (self.max_seq_len, self.embed_dim))
        self.blocks = [
            SASRecBlock(self.embed_dim, self.num_heads, self.ffn_dim,
                        self.dropout, dtype=self.dtype, name=f"block_{i}")
            for i in range(self.num_blocks)]
        self.final_norm = nn.LayerNorm(epsilon=1e-8, dtype=self.dtype,
                                       name="final_norm")
        self.emb_dropout = HwDropout(self.dropout)

    def hidden(self, input_ids: jnp.ndarray, deterministic: bool = True):
        """(B, L, D) final hidden states + the (zero-pad-row) item table.

        Exposed so sharded eval can score ``hidden @ tableᵀ`` with the table
        row-sharded (ops.sharded_topk) instead of materialising (B, L, V)."""
        B, L = input_ids.shape
        item_emb = self.item_embedding.at[0].set(0.0)   # pad row pinned
        mask = (input_ids != 0)[..., None].astype(self.dtype)   # (B, L, 1)
        x = jnp.take(item_emb, input_ids, axis=0).astype(self.dtype)
        x = x * (self.embed_dim ** 0.5)
        x = x + self.position_embedding[None, :L].astype(self.dtype)
        x = self.emb_dropout(x, deterministic=deterministic)
        x = x * mask
        for blk in self.blocks:
            x = blk(x, mask, deterministic)
            x = x * mask
        return self.final_norm(x), item_emb

    def last_hidden(self, input_ids: jnp.ndarray,
                    deterministic: bool = True) -> jnp.ndarray:
        x, _ = self.hidden(input_ids, deterministic=deterministic)
        return x[:, -1, :]

    def __call__(self, input_ids: jnp.ndarray,
                 targets: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> SASRecOutput:
        x, item_emb = self.hidden(input_ids, deterministic=deterministic)

        if targets is not None and self.fused_ce:
            # chunked linear+CE: the (B, L, V) fp32 logits/log-softmax pair
            # never materialises (V is the full catalog); pad id 0 is the
            # ignore index, exactly as the naive branch below
            from genrec_tpu.ops.fused_ce import fused_linear_cross_entropy
            V = item_emb.shape[0]
            chunk = min(4096, max(128, -(-V // 128) * 128))
            loss = fused_linear_cross_entropy(
                x.reshape(-1, x.shape[-1]),
                item_emb, targets.reshape(-1).astype(jnp.int32),
                0, chunk, True)
            return SASRecOutput(logits=None, loss=loss)

        logits = jnp.einsum("bld,vd->blv", x, item_emb.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits, axis=-1)
            tgt_logp = jnp.take_along_axis(
                logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
            ignore = (targets != 0).astype(jnp.float32)
            loss = -(tgt_logp * ignore).sum() / jnp.maximum(ignore.sum(), 1.0)
        return SASRecOutput(logits=logits, loss=loss)


def predict_topk(logits_last: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k items from last-position logits, excluding the pad id 0."""
    logits_last = logits_last.at[:, 0].set(-jnp.inf)
    _, idx = jax.lax.top_k(logits_last, k)
    return idx
