"""Text encoders producing dense item vectors (COBRA's dense tower).

Parity target: ``/root/reference/genrec/modules/encoder.py``:
``LightT5Encoder`` (:15-106 — random-init transformer encoder over tokens,
masked mean-pool, LayerNorm, linear projection, L2-normalize; handles (B, L)
or (B, T, L) inputs) and the pretrained wrappers ``SentenceT5Encoder``
(:108-199), ``ErnieEncoder`` (:202-294), ``BgeEncoder`` (:297-377) — the
pretrained ones are HF-hub models and are provided here as gated host-side
wrappers (no egress in this environment; they activate only with a local
model path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from genrec_tpu.nn.dropout import Dropout as HwDropout

from genrec_tpu.ops.normalize import l2norm
from .transformer import NEG_INF


class _EncoderBlock(nn.Module):
    """Post-norm transformer encoder layer (torch nn.TransformerEncoderLayer
    semantics: attn → add+LN → FFN(relu) → add+LN, biases on)."""
    dim: int
    num_heads: int
    ff_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        # init parity with torch nn.TransformerEncoderLayer (the reference
        # LightT5Encoder's block, encoder.py:49-58): MHA in_proj
        # xavier_uniform + zero bias, out_proj/linear1/linear2 at torch
        # Linear defaults (U(±1/√fan_in) kernel AND bias)
        from genrec_tpu.nn.transformer import (TORCH_LINEAR_INIT,
                                               XAVIER_UNIFORM_INIT,
                                               torch_linear_bias_init)
        B, L, D = x.shape
        H = self.num_heads
        Dh = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype,
                       kernel_init=XAVIER_UNIFORM_INIT, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        scores = jnp.where(pad_mask[:, None, None, :], NEG_INF, scores)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        # torch MHA applies dropout on the attention WEIGHTS during
        # training (nn.TransformerEncoderLayer passes its dropout down) —
        # a parity-relevant regularizer, not just an output dropout
        probs = HwDropout(self.dropout)(probs, deterministic=deterministic)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32)
        attn = attn.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, L, D)
        attn = nn.Dense(D, dtype=self.dtype, kernel_init=TORCH_LINEAR_INIT,
                        name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x + HwDropout(
            self.dropout)(attn, deterministic=deterministic)).astype(self.dtype)
        h = nn.Dense(self.ff_dim, dtype=self.dtype,
                     kernel_init=TORCH_LINEAR_INIT,
                     bias_init=torch_linear_bias_init(D), name="ff1")(x)
        h = nn.relu(h)
        h = HwDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(D, dtype=self.dtype, kernel_init=TORCH_LINEAR_INIT,
                     bias_init=torch_linear_bias_init(self.ff_dim),
                     name="ff2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            x + HwDropout(self.dropout)(h, deterministic=deterministic)
        ).astype(self.dtype)


class LightTextEncoder(nn.Module):
    """Random-init transformer text encoder → pooled, L2-normed vectors."""
    n_layers: int = 1
    hidden_dim: int = 768
    output_dim: int = 768
    num_heads: int = 8
    ff_dim: int = 2048
    vocab_size: int = 32128
    max_seq_len: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """(B, L) or (B, T, L) token ids (0 = pad) → (B, D) or (B, T, D)."""
        orig_rank = tokens.ndim
        if orig_rank == 3:
            B, T, L = tokens.shape
            flat = tokens.reshape(B * T, L)
        else:
            flat = tokens
        from genrec_tpu.nn.transformer import (TORCH_LINEAR_INIT,
                                               torch_linear_bias_init)
        L = flat.shape[1]
        # init parity: torch nn.Embedding defaults to N(0, 1)
        # (reference encoder.py:46-47); flax's variance-scaled default is
        # ~1/√hidden — the same class of gap as the TIGER Dense fix
        emb = nn.Embed(self.vocab_size, self.hidden_dim, dtype=self.dtype,
                       embedding_init=nn.initializers.normal(stddev=1.0),
                       name="embedding")(flat)
        pos = nn.Embed(self.max_seq_len, self.hidden_dim, dtype=self.dtype,
                       embedding_init=nn.initializers.normal(stddev=1.0),
                       name="pos_embedding")(jnp.arange(L)[None])
        x = emb + pos
        pad = flat == 0
        for i in range(self.n_layers):
            x = _EncoderBlock(self.hidden_dim, self.num_heads, self.ff_dim,
                              self.dropout, dtype=self.dtype,
                              name=f"layer_{i}")(x, pad, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_norm")(x).astype(
            self.dtype)
        keep = jnp.logical_not(pad)[..., None].astype(x.dtype)
        pooled = (x * keep).sum(axis=1) / jnp.maximum(
            keep.sum(axis=1), 1e-9)
        out = l2norm(nn.Dense(self.output_dim, dtype=self.dtype,
                              kernel_init=TORCH_LINEAR_INIT,
                              bias_init=torch_linear_bias_init(
                                  self.hidden_dim),
                              name="proj")(pooled))
        if orig_rank == 3:
            out = out.reshape(B, T, self.output_dim)
        return out


class PretrainedTextEncoder:
    """Host-side wrapper over a locally-cached HF sentence encoder
    (sentence-t5 / ernie / bge parity). Raises a clear error when the model
    is not available locally (zero-egress environment)."""

    def __init__(self, model_name_or_path: str, pooling: str = "mean"):
        import os
        if not os.path.exists(model_name_or_path):
            raise FileNotFoundError(
                f"Pretrained encoder {model_name_or_path!r} is not cached "
                f"locally and downloads are disabled; use "
                f"LightTextEncoder or provision the model.")
        from transformers import AutoModel, AutoTokenizer
        self._tok = AutoTokenizer.from_pretrained(model_name_or_path)
        self._model = AutoModel.from_pretrained(model_name_or_path)
        self._pooling = pooling

    def encode(self, texts, batch_size: int = 32) -> np.ndarray:
        import torch
        outs = []
        for i in range(0, len(texts), batch_size):
            enc = self._tok(list(texts[i:i + batch_size]), padding=True,
                            truncation=True, return_tensors="pt")
            with torch.no_grad():
                hidden = self._model(**enc).last_hidden_state
            mask = enc["attention_mask"][..., None].float()
            if self._pooling == "cls":
                pooled = hidden[:, 0]
            else:
                pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
            pooled = torch.nn.functional.normalize(pooled, dim=-1)
            outs.append(pooled.numpy())
        return np.concatenate(outs)


def sentence_t5_encoder(model_path: str) -> "PretrainedTextEncoder":
    """Masked-mean pooling (reference ``SentenceT5Encoder``,
    modules/encoder.py:108-199)."""
    return PretrainedTextEncoder(model_path, pooling="mean")


def ernie_encoder(model_path: str) -> "PretrainedTextEncoder":
    """CLS pooling (reference ``ErnieEncoder``, modules/encoder.py:202-294)."""
    return PretrainedTextEncoder(model_path, pooling="cls")


def bge_encoder(model_path: str) -> "PretrainedTextEncoder":
    """CLS pooling + L2 norm (reference ``BgeEncoder``,
    modules/encoder.py:297-377)."""
    return PretrainedTextEncoder(model_path, pooling="cls")
