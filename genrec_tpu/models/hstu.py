"""HSTU: hierarchical sequential transduction units (Flax).

Parity target: ``/root/reference/genrec/models/hstu.py``: single fused
projection → SiLU → split into U,V,Q,K (:232-235), scores = QKᵀ + T5-style
log-bucket **relative position bias** shared across layers? (no — per-layer,
:190-196) + optional **temporal bias** from log₂-bucketed timestamp deltas
(:352-409: bucket = ⌊ln(max(1,|Δt|))/ln 2⌋ clamped), **SiLU instead of
softmax** on scores (:261-263), LayerNorm then element-wise gating by U
(:269-272), residual, FFN 4× SiLU (:209-215), final LayerNorm, logits = dot
with the item-embedding table, CE ``ignore_index=0`` (:139-157).

TPU-first notes: SiLU attention needs no row reduction (no softmax), so the
whole score→weight→AV chain fuses into two MXU matmuls + a VPU elementwise —
cheaper than softmax attention on TPU. Biases are gathers over static bucket
grids that constant-fold under jit (position) or batch gathers (temporal).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.nn.dropout import Dropout as HwDropout

from genrec_tpu.configlib import gin

NEG_INF = -1e9

# Weight-init parity: the reference initializes EVERY nn.Linear and
# nn.Embedding weight with trunc_normal_(std=0.02), zero biases
# (/root/reference/genrec/models/hstu.py:85-97). Flax Dense's default
# (lecun_normal, std 1/sqrt(fan_in) = 0.125 at d=64) is ~6x larger and was
# a measurable quality handicap in the r3 head-to-head parity runs.
#
# r5 subtlety: torch's trunc_normal_ default bounds a=-2, b=2 are ABSOLUTE,
# so at std=0.02 they sit at +-100 sigma — the draw is an untruncated
# normal with std exactly 0.02 (measured 0.01998). jax/flax
# truncated_normal(stddev=s) instead truncates at +-2 sigma, shrinking the
# realised std to 0.8796*s (measured 0.01757) — a systematic -12% init
# scale on every weight, the same bug class that cost TIGER/COBRA quality
# in r4. normal(0.02) is the torch-exact distribution (truncation at
# 100 sigma has ~1e-2000 mass).
_REF_INIT = nn.initializers.normal(stddev=0.02)


class HSTUOutput(NamedTuple):
    logits: Optional[jnp.ndarray]
    loss: Optional[jnp.ndarray]


def _position_bucket(relative_position: jnp.ndarray, num_buckets: int,
                     max_distance: int) -> jnp.ndarray:
    """Causal log-bucketing (reference hstu.py:305-334)."""
    rp = jnp.maximum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rp, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.clip(large, None, num_buckets - 1)
    return jnp.where(is_small, rp, large)


def _temporal_bucket(time_diff: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """bucket = ⌊ln(max(1,|Δt|)) / ln 2⌋, clamped (reference hstu.py:368-384)."""
    abs_diff = jnp.maximum(jnp.abs(time_diff), 1).astype(jnp.float32)
    buckets = (jnp.log(abs_diff) / 0.693).astype(jnp.int32)
    return jnp.clip(buckets, 0, num_buckets - 1)


class HSTULayer(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float
    num_position_buckets: int
    num_time_buckets: int
    max_position_distance: int
    use_temporal_bias: bool
    dtype: jnp.dtype = jnp.float32
    # optional attention override: called as attn_impl(q, k, v, pos_table,
    # time_table, timestamps, padding_mask, max_position_distance) on the
    # post-split (B, H, L, Dh) tensors; must apply the biases and the
    # causal/padding masks itself. Used by the sequence-parallel ring
    # executor (parallel/ring.py). Adds no params.
    attn_impl: Optional[object] = None

    @nn.compact
    def __call__(self, x, padding_mask, time_onehot=None,
                 deterministic: bool = True, timestamps=None):
        B, L, D = x.shape
        H, Dh = self.num_heads, self.embed_dim // self.num_heads
        residual = x

        projected = nn.silu(nn.Dense(4 * D, dtype=self.dtype,
                                     kernel_init=_REF_INIT,
                                     name="projection")(x))
        u, v, q, k = jnp.split(projected, 4, axis=-1)
        split = lambda t: t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        # init parity (/root/reference/genrec/models/hstu.py:85-97): the
        # bias tables are nn.Embedding there, so trunc_normal(0.02) like
        # every other weight — near-zero initial attention bias.
        pos_table = self.param("position_bias", _REF_INIT,
                               (self.num_position_buckets, H))

        if self.attn_impl is not None:
            time_table = None
            if self.use_temporal_bias and timestamps is not None:
                time_table = self.param("temporal_bias", _REF_INIT,
                                        (self.num_time_buckets, H))
            out = self.attn_impl(q, k, v, pos_table, time_table,
                                 timestamps, padding_mask,
                                 self.max_position_distance)
            out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(
                B, L, D)
            return self._gate_and_ffn(residual, out, u, deterministic)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)

        pos = jnp.arange(L)
        # Reference orientation quirk (hstu.py:380-384): the code computes
        # key_pos - query_pos (its comment claims the opposite) and then
        # clamps at 0, so the causal region lands in bucket 0. The published
        # numbers were produced with this behavior, so it is replicated
        # verbatim; interop parity depends on it (tests/test_interop.py).
        buckets = _position_bucket(pos[None, :] - pos[:, None],
                                   self.num_position_buckets,
                                   self.max_position_distance)   # (L, L)
        pos_bias = jnp.take(pos_table, buckets, axis=0)           # (L, L, H)
        scores = scores + pos_bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        if self.use_temporal_bias and time_onehot is not None:
            time_table = self.param("temporal_bias", _REF_INIT,
                                    (self.num_time_buckets, H))
            # one-hot matmul instead of gather: the gather's backward is a
            # 640k-element scatter-add into the 64-row table — measured
            # 2.4 ms/layer/step at the paper config (B=128, L=50); as a
            # matmul both directions ride the MXU. The (B,L,L,NB) one-hot
            # is built once in HSTU.__call__ and shared by all layers.
            # no preferred_element_type: every one-hot row has exactly one
            # nonzero, so there is no accumulation to protect (and the CPU
            # backend lacks a BF16xBF16=F32 dot).
            tbias = jnp.einsum("bqkn,nh->bhqk", time_onehot,
                               time_table.astype(time_onehot.dtype))
            scores = scores + tbias.astype(jnp.float32)

        causal = jnp.triu(jnp.ones((L, L), bool), k=1)
        scores = jnp.where(causal[None, None], NEG_INF, scores)
        scores = jnp.where(padding_mask[:, None, None, :], NEG_INF, scores)

        attn = nn.silu(scores).astype(self.dtype)   # silu(-1e9) == 0: masked
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return self._gate_and_ffn(residual, out, u, deterministic)

    def _gate_and_ffn(self, residual, out, u, deterministic):
        D = self.embed_dim
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="attn_norm")(out)
        out = (out * u).astype(self.dtype)
        x = residual + HwDropout(self.dropout)(out,
                                                deterministic=deterministic)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="ffn_norm")(x).astype(self.dtype)
        h = nn.Dense(4 * D, dtype=self.dtype, kernel_init=_REF_INIT,
                     name="ffn_in")(h)
        h = nn.silu(h)
        h = HwDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(D, dtype=self.dtype, kernel_init=_REF_INIT,
                     name="ffn_out")(h)
        h = HwDropout(self.dropout)(h, deterministic=deterministic)
        return x + h


@gin.configurable
class HSTU(nn.Module):
    num_items: int = 10000
    max_seq_len: int = 50
    embed_dim: int = 64
    num_heads: int = 2
    num_blocks: int = 2
    dropout: float = 0.2
    num_position_buckets: int = 32
    num_time_buckets: int = 64
    max_position_distance: int = 128
    use_temporal_bias: bool = True
    fused_ce: bool = True   # chunked loss: no (B, L, V) logits in HBM
    dtype: jnp.dtype = jnp.float32
    # sequence-parallel attention override (see HSTULayer.attn_impl). Also
    # disables the (B, L, L, NB) temporal one-hot, which is quadratic in L
    # and exactly what long-history sequence parallelism must avoid — the
    # ring computes per-step bucket gathers instead.
    attn_impl: Optional[object] = None

    @nn.compact
    def __call__(self, input_ids, timestamps=None, targets=None,
                 deterministic: bool = True, return_hidden: bool = False):
        """``return_hidden=True`` short-circuits to ``(hidden, item_emb)``
        before the logits matmul — for sharded losses (vocab-parallel CE)
        that score against the row-sharded table themselves."""
        item_emb = self.param(
            "item_embedding", _REF_INIT,
            (self.num_items + 1, self.embed_dim))
        item_emb = item_emb.at[0].set(0.0)
        padding_mask = input_ids == 0

        x = jnp.take(item_emb, input_ids, axis=0).astype(self.dtype)
        x = HwDropout(self.dropout)(x, deterministic=deterministic)
        time_onehot = None
        if self.attn_impl is None and self.use_temporal_bias \
                and timestamps is not None:
            diff = timestamps[:, :, None] - timestamps[:, None, :]
            tbuckets = _temporal_bucket(diff, self.num_time_buckets)
            time_onehot = jax.nn.one_hot(tbuckets, self.num_time_buckets,
                                         dtype=self.dtype)    # (B,L,L,NB)
        for i in range(self.num_blocks):
            x = HSTULayer(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dropout=self.dropout,
                num_position_buckets=self.num_position_buckets,
                num_time_buckets=self.num_time_buckets,
                max_position_distance=self.max_position_distance,
                use_temporal_bias=self.use_temporal_bias,
                dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"layer_{i}")(
                    x, padding_mask, time_onehot, deterministic,
                    timestamps=timestamps)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="final_norm")(x).astype(self.dtype)

        if return_hidden:
            return x, item_emb

        if targets is not None and self.fused_ce:
            # chunked linear+CE over the full catalog (see sasrec.py)
            from genrec_tpu.ops.fused_ce import fused_linear_cross_entropy
            V = item_emb.shape[0]
            chunk = min(4096, max(128, -(-V // 128) * 128))
            loss = fused_linear_cross_entropy(
                x.reshape(-1, x.shape[-1]),
                item_emb, targets.reshape(-1).astype(jnp.int32),
                0, chunk, True)
            return HSTUOutput(logits=None, loss=loss)

        logits = jnp.einsum("bld,vd->blv", x, item_emb.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits, axis=-1)
            tgt_logp = jnp.take_along_axis(
                logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
            ignore = (targets != 0).astype(jnp.float32)
            loss = -(tgt_logp * ignore).sum() / jnp.maximum(ignore.sum(), 1.0)
        return HSTUOutput(logits=logits, loss=loss)
