"""T5-style transformer encoder-decoder (Flax), used by TIGER.

Parity target: ``/root/reference/genrec/modules/transformer.py``:
``_relative_position_bucket`` (:13-41), ``T5Attention`` (:44-159, fused kv
projection for self-attention, per-(head, bucket) scalar relative bias,
no bias on cross-attention), ``FeedForward`` (:162-189, dense-relu-dense,
bias-free), ``TransformerBlock`` (:256-324, pre-norm, optional cross-attn),
``TransformerEncoder``/``Decoder``/``TransformerEncoderDecoder`` (:327-476,
auto causal target mask). Each block owns its own relative-bias table, as in
the reference (not shared across layers like HF T5).

TPU-first notes: attention scores and softmax accumulate in float32 with
``preferred_element_type`` so the MXU runs bf16 inputs at full throughput;
masks are boolean (``True`` = masked) turned into additive ``-1e9``/``-inf``
inside; the relative-bias gather over a static (q_len, k_len) grid constant-
folds under jit.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.nn.dropout import Dropout as HwDropout

from .normalize import RMSNorm

NEG_INF = -1e9

# Weight-init parity: every projection in the reference custom transformer
# is a torch ``nn.Linear`` left at its DEFAULT init — kaiming_uniform(a=√5)
# = U(±1/√fan_in), std 1/√(3·fan_in)
# (``/root/reference/genrec/modules/transformer.py:67-74,177-178``). Flax
# Dense's lecun_normal default has 3× that variance; the analogous mismatch
# measurably cost SASRec/HSTU quality in the r3 head-to-head parity runs
# (e543f08), so TIGER's transformer gets the exact torch-default
# distribution: variance_scaling(1/3, fan_in, uniform) ⇒ bound
# √(3·(1/3)/fan_in) = 1/√fan_in.
TORCH_LINEAR_INIT = nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                     "uniform")

# torch nn.Linear's default BIAS init: U(±1/√fan_in). flax can't see
# fan_in from the bias shape, so callers pass it explicitly.
def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# torch nn.MultiheadAttention._reset_parameters: xavier_uniform on the
# fused in-projection (out_proj keeps the Linear default; both biases 0)
XAVIER_UNIFORM_INIT = nn.initializers.xavier_uniform()


def relative_position_bucket(relative_positions: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128,
                             bidirectional: bool = True) -> jnp.ndarray:
    """Map signed relative positions (mem - ctx) to log-spaced bucket ids."""
    ret = -relative_positions
    if bidirectional:
        num_buckets //= 2
        sign = (ret < 0).astype(jnp.int32)
        ret = jnp.abs(ret)
    else:
        sign = None
        ret = jnp.maximum(ret, 0)

    max_exact = num_buckets // 2
    is_small = ret < max_exact
    term = (jnp.log(ret.astype(jnp.float32) / max_exact + 1e-6)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)).astype(jnp.int32)
    large = max_exact + jnp.minimum(term, num_buckets - max_exact - 1)
    ret = jnp.where(is_small, ret, large)
    if bidirectional:
        ret = ret + sign * num_buckets
    return ret


def relative_bias_from_table(table: jnp.ndarray, n_heads: int,
                             num_buckets: int, max_distance: int,
                             q_len: int, k_len: int) -> jnp.ndarray:
    """(H, q_len, k_len) additive bias from a (H·NB, 1) per-(head,bucket)
    scalar table.

    Expressed as ``one_hot(buckets) @ table`` rather than a gather: the
    bucket grid is static so the one-hot constant-folds, the forward is
    a tiny MXU matmul and the backward a matmul instead of a
    22k-element scatter-add into 192 rows (~1.5 ms/step across layers
    at the TIGER paper config, round-2 profile)."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, num_buckets, max_distance, bidirectional=True)   # (q, k)
    onehot = jax.nn.one_hot(buckets, num_buckets, dtype=jnp.float32)
    table2 = table[:, 0].reshape(n_heads, num_buckets)
    return jnp.einsum("qkb,hb->hqk", onehot, table2.astype(jnp.float32))


class T5Attention(nn.Module):
    d_model: int
    n_heads: int
    dropout: float = 0.0
    is_cross_attention: bool = False
    has_relative_bias: bool = True
    num_relative_buckets: int = 32
    max_distance: int = 128
    use_fused: bool = True   # Pallas fused attention on TPU (XLA elsewhere)
    dtype: jnp.dtype = jnp.float32

    def _rel_bias(self, q_len: int, k_len: int) -> jnp.ndarray:
        """(1, H, q_len, k_len) additive bias (see relative_bias_from_table)."""
        table = self.param(
            "rel_bias", nn.initializers.normal(stddev=1.0),
            (self.n_heads * self.num_relative_buckets, 1))
        return relative_bias_from_table(
            table, self.n_heads, self.num_relative_buckets,
            self.max_distance, q_len, k_len)[None]

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None,
                 value: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 cached_kv: Optional[tuple] = None,
                 kv_only: bool = False):
        """``kv_only=True`` (cross path): project and return ``(k, v)`` of
        ``key``/``value`` without attending — the generation fast path
        computes each layer's cross K/V from the encoder memory ONCE and
        replays it for every beam and decode level via ``cached_kv``
        (see Tiger.make_generate_fn). Both flags are apply-time only; the
        param tree is created by the training ``__call__``."""
        assert self.d_model % self.n_heads == 0, (
            f"d_model={self.d_model} not divisible by n_heads={self.n_heads}")
        head_dim = self.d_model // self.n_heads
        dense = lambda feats, nm: nn.Dense(feats, use_bias=False,
                                           kernel_init=TORCH_LINEAR_INIT,
                                           dtype=self.dtype, name=nm)
        if kv_only:
            assert self.is_cross_attention
            return dense(self.d_model, "k")(key), \
                dense(self.d_model, "v")(value)
        if cached_kv is not None:
            k, v = cached_kv
        elif self.is_cross_attention:
            k = dense(self.d_model, "k")(key)
            v = dense(self.d_model, "v")(value)
        else:
            kv = dense(2 * self.d_model, "kv")(query)
            k, v = jnp.split(kv, 2, axis=-1)
        q = dense(self.d_model, "q")(query)

        def split_heads(x):
            b, l, _ = x.shape
            return x.reshape(b, l, self.n_heads, head_dim).transpose(0, 2, 1, 3)

        # --- fused Pallas path: the whole scores→softmax→dropout→@V chain
        # stays in VMEM in the head-interleaved (B, S, H·Dh) layout, so no
        # (B, H, S, S) tensors, dropout masks or q/k/v transposes hit HBM.
        mask_2d = attn_mask is None or attn_mask.ndim == 2
        if self.use_fused and mask_2d:
            from genrec_tpu.kernels.attention import (fused_attention,
                                                      fused_attention_supported)
            if fused_attention_supported(q.shape, self.n_heads):
                if self.has_relative_bias and not self.is_cross_attention:
                    bias = self._rel_bias(q.shape[1], k.shape[1])[0]
                else:
                    bias = jnp.zeros((self.n_heads, q.shape[1], k.shape[1]),
                                     jnp.float32)
                if attn_mask is not None:
                    bias = bias + attn_mask[None].astype(jnp.float32)
                kpad = None
                if key_padding_mask is not None:
                    kpad = jnp.where(key_padding_mask, NEG_INF, 0.0)
                rate = 0.0 if deterministic else self.dropout
                seed = 0
                if rate > 0.0:
                    from genrec_tpu.core.rng import seed_from_rng
                    seed = seed_from_rng(self.make_rng("dropout"))
                out = fused_attention(q, k, v, bias, kpad,
                                      n_heads=self.n_heads, seed=seed,
                                      dropout_rate=rate)
                return dense(self.d_model, "o")(out)

        q, k, v = map(split_heads, (q, k, v))
        # bf16 inputs accumulate in fp32 on the MXU regardless; forcing an
        # fp32 *output* (preferred_element_type) would also push the backward
        # matmuls to fp32 rate. Compute in the model dtype, then upcast for
        # the softmax.
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        scores = scores * (1.0 / math.sqrt(head_dim))

        if self.has_relative_bias and not self.is_cross_attention:
            scores = scores + self._rel_bias(q.shape[2], k.shape[2])
        if key_padding_mask is not None:  # (B, k_len), True = pad
            scores = jnp.where(key_padding_mask[:, None, None, :],
                               NEG_INF, scores)
        if attn_mask is not None:         # additive float mask
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            elif attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            scores = scores + attn_mask

        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = HwDropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        return dense(self.d_model, "o")(out)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                     kernel_init=TORCH_LINEAR_INIT, name="wi")(x)
        x = nn.relu(x)
        x = HwDropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=TORCH_LINEAR_INIT, name="wo")(x)


# --- param accessors for the fused encoder-layer kernel -------------------
#
# The fused path (kernels.encoder_layer) needs the raw weight arrays of the
# block's children without running them. These modules create parameters at
# EXACTLY the same tree paths (and with the same initializers) as the
# nn.Dense / RMSNorm children of the standard path, so checkpoints are
# interchangeable between the fused and unfused paths.

class _DenseKernel(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", TORCH_LINEAR_INIT, self.shape)


class _NormWeight(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.ones, (self.dim,))


class _AttnWeights(nn.Module):
    """Mirrors T5Attention's self-attention param tree (q, kv, o, rel_bias)."""
    d_model: int
    n_heads: int
    num_relative_buckets: int = 32

    @nn.compact
    def __call__(self):
        d = self.d_model
        wq = _DenseKernel((d, d), name="q")()
        wkv = _DenseKernel((d, 2 * d), name="kv")()
        wo = _DenseKernel((d, d), name="o")()
        table = self.param("rel_bias", nn.initializers.normal(stddev=1.0),
                           (self.n_heads * self.num_relative_buckets, 1))
        return wq, wkv, wo, table


class _FFWeights(nn.Module):
    """Mirrors FeedForward's param tree (wi, wo)."""
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self):
        wi = _DenseKernel((self.dim, self.hidden_dim), name="wi")()
        wo = _DenseKernel((self.hidden_dim, self.dim), name="wo")()
        return wi, wo


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.1
    ff_hidden_dim: int = 2048
    cross_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, context=None, attn_mask=None,
                 key_padding_mask=None, memory_key_padding_mask=None,
                 deterministic: bool = True, cross_cached_kv=None,
                 cross_kv_only: bool = False):
        if cross_kv_only:
            # generation fast path: project this layer's cross K/V from the
            # raw memory (cross k/v read ``context`` only — norm_cross
            # applies to x, so K/V are reusable across beams/levels)
            return T5Attention(
                self.dim, self.num_heads, self.dropout,
                is_cross_attention=True, has_relative_bias=False,
                dtype=self.dtype, name="cross_attn_layer")(
                    x, key=context, value=context, kv_only=True)
        from genrec_tpu.kernels.encoder_layer import (
            fused_encoder_layer, fused_encoder_layer_supported)
        if (not self.cross_attn and attn_mask is None
                and fused_encoder_layer_supported(x.shape[1], self.dim,
                                                  self.num_heads)):
            # megakernel path: whole layer in one pallas call; param tree
            # identical to the standard path (see _AttnWeights/_FFWeights)
            wq, wkv, wo, table = _AttnWeights(self.dim, self.num_heads,
                                              name="self_attn")()
            g1 = _NormWeight(self.dim, name="norm1")()
            g2 = _NormWeight(self.dim, name="norm2")()
            wi, wo2 = _FFWeights(self.dim, self.ff_hidden_dim, name="ff")()
            S = x.shape[1]
            bias = relative_bias_from_table(table, self.num_heads, 32, 128,
                                            S, S)
            kpad = None
            if key_padding_mask is not None:
                kpad = jnp.where(key_padding_mask, NEG_INF, 0.0)
            rate = 0.0 if deterministic else self.dropout
            seeds = jnp.zeros((4,), jnp.int32)
            if rate > 0.0:
                from genrec_tpu.core.rng import seed_from_rng
                seeds = seed_from_rng(self.make_rng("dropout"), (4,))
            return fused_encoder_layer(
                x, wq=wq, wkv=wkv, wo=wo, g1=g1, g2=g2, wi=wi, wo2=wo2,
                bias=bias, kpad=kpad, n_heads=self.num_heads, seeds=seeds,
                dropout_rate=rate)
        drop = HwDropout(self.dropout)
        attn_out = T5Attention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn")(
                RMSNorm(self.dim, name="norm1")(x),
                attn_mask=attn_mask, key_padding_mask=key_padding_mask,
                deterministic=deterministic)
        x = x + drop(attn_out, deterministic=deterministic)

        if self.cross_attn and (context is not None
                                or cross_cached_kv is not None):
            cross_out = T5Attention(
                self.dim, self.num_heads, self.dropout,
                is_cross_attention=True, has_relative_bias=False,
                dtype=self.dtype, name="cross_attn_layer")(
                    RMSNorm(self.dim, name="norm_cross")(x),
                    key=context, value=context,
                    key_padding_mask=memory_key_padding_mask,
                    deterministic=deterministic,
                    cached_kv=cross_cached_kv)
            x = x + drop(cross_out, deterministic=deterministic)

        from genrec_tpu.kernels.ffn_block import (fused_ffn_block,
                                                  fused_ffn_supported)
        if fused_ffn_supported(self.dim, self.ff_hidden_dim):
            # fused pre-norm FFN: one pallas call, param tree identical to
            # the standard path below (see _FFWeights/_NormWeight)
            g2 = _NormWeight(self.dim, name="norm2")()
            wi, wo2 = _FFWeights(self.dim, self.ff_hidden_dim, name="ff")()
            rate = 0.0 if deterministic else self.dropout
            seeds = jnp.zeros((2,), jnp.int32)
            if rate > 0.0:
                from genrec_tpu.core.rng import seed_from_rng
                seeds = seed_from_rng(self.make_rng("dropout"), (2,))
            return fused_ffn_block(x, g=g2, wi=wi, wo=wo2, seeds=seeds,
                                   dropout_rate=rate)
        ff_out = FeedForward(self.dim, self.ff_hidden_dim, self.dropout,
                             dtype=self.dtype, name="ff")(
            RMSNorm(self.dim, name="norm2")(x), deterministic=deterministic)
        return x + drop(ff_out, deterministic=deterministic)


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) additive causal mask: 0 on/below diagonal, -inf above."""
    return jnp.triu(jnp.full((length, length), NEG_INF, dtype=dtype), k=1)


class TransformerEncoder(nn.Module):
    dim: int
    depth: int
    num_heads: int
    dropout: float = 0.1
    ff_hidden_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, *, attn_mask=None, key_padding_mask=None,
                 deterministic: bool = True):
        for i in range(self.depth):
            src = TransformerBlock(
                self.dim, self.num_heads, self.dropout,
                ff_hidden_dim=self.ff_hidden_dim, cross_attn=False,
                dtype=self.dtype, name=f"layer_{i}")(
                    src, attn_mask=attn_mask,
                    key_padding_mask=key_padding_mask,
                    deterministic=deterministic)
        return src


class TransformerDecoder(nn.Module):
    dim: int
    depth: int
    num_heads: int
    dropout: float = 0.1
    ff_hidden_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, *, memory=None, attn_mask=None,
                 key_padding_mask=None, memory_key_padding_mask=None,
                 deterministic: bool = True, cross_kv=None,
                 cross_kv_only: bool = False):
        """``cross_kv_only=True``: return the per-layer cross (k, v) list
        projected from ``memory`` (generation fast path); ``cross_kv``:
        replay such a list instead of projecting per call."""
        if cross_kv_only:
            return [TransformerBlock(
                self.dim, self.num_heads, self.dropout,
                ff_hidden_dim=self.ff_hidden_dim, cross_attn=True,
                dtype=self.dtype, name=f"layer_{i}")(
                    tgt, context=memory, cross_kv_only=True)
                for i in range(self.depth)]
        for i in range(self.depth):
            tgt = TransformerBlock(
                self.dim, self.num_heads, self.dropout,
                ff_hidden_dim=self.ff_hidden_dim, cross_attn=True,
                dtype=self.dtype, name=f"layer_{i}")(
                    tgt, context=memory, attn_mask=attn_mask,
                    key_padding_mask=key_padding_mask,
                    memory_key_padding_mask=memory_key_padding_mask,
                    deterministic=deterministic,
                    cross_cached_kv=None if cross_kv is None
                    else cross_kv[i])
        return tgt


class TransformerEncoderDecoder(nn.Module):
    d_model: int
    nhead: int
    num_encoder_layers: int
    num_decoder_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TransformerEncoder(
            self.d_model, self.num_encoder_layers, self.nhead, self.dropout,
            ff_hidden_dim=self.dim_feedforward, dtype=self.dtype)
        self.decoder = TransformerDecoder(
            self.d_model, self.num_decoder_layers, self.nhead, self.dropout,
            ff_hidden_dim=self.dim_feedforward, dtype=self.dtype)

    def encode(self, src, *, src_mask=None, src_key_padding_mask=None,
               deterministic: bool = True):
        return self.encoder(src, attn_mask=src_mask,
                            key_padding_mask=src_key_padding_mask,
                            deterministic=deterministic)

    def decode(self, tgt, memory, *, tgt_mask=None, tgt_key_padding_mask=None,
               memory_key_padding_mask=None, deterministic: bool = True,
               cross_kv=None):
        if tgt_mask is None:
            tgt_mask = causal_mask(tgt.shape[1])
        return self.decoder(tgt, memory=memory, attn_mask=tgt_mask,
                            key_padding_mask=tgt_key_padding_mask,
                            memory_key_padding_mask=memory_key_padding_mask,
                            deterministic=deterministic, cross_kv=cross_kv)

    def precompute_cross_kv(self, memory):
        """Per-decoder-layer cross (k, v) projections of ``memory`` —
        compute once per generate call, replay via ``decode(cross_kv=...)``
        (each level/beam re-projected them before: a K·C-fold duplication
        of the dominant generation FLOP term)."""
        dummy = memory[:, :1, :]
        return self.decoder(dummy, memory=memory, cross_kv_only=True)

    def __call__(self, src, tgt, *, src_key_padding_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 src_mask=None, tgt_mask=None, deterministic: bool = True):
        memory = self.encode(src, src_mask=src_mask,
                             src_key_padding_mask=src_key_padding_mask,
                             deterministic=deterministic)
        return self.decode(tgt, memory, tgt_mask=tgt_mask,
                           tgt_key_padding_mask=tgt_key_padding_mask,
                           memory_key_padding_mask=memory_key_padding_mask,
                           deterministic=deterministic)
