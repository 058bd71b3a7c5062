"""Normalization layers (Flax).

Parity target: ``/root/reference/genrec/modules/normalize.py``: ``L2Norm``
(:38-55), ``RMSNorm`` (:58-70), ``SwishLayerNorm`` (:73-96, silu∘LayerNorm),
``RootMeanSquareLayerNorm`` (:99-127, T5-style → here :class:`T5LayerNorm`).
All variance accumulation is done in float32 regardless of activation dtype
(TPU rule: norms/softmax in fp32, matmuls in bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.ops.normalize import l2norm


class L2Norm(nn.Module):
    axis: int = -1
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        return l2norm(x, axis=self.axis, eps=self.eps)


class RMSNorm(nn.Module):
    """RMS norm with a learned scale; fp32 statistics."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1,
                                             keepdims=True) + self.eps)
        return (normed.astype(x.dtype) * weight).astype(x.dtype)


class T5LayerNorm(nn.Module):
    """T5-style RMS layer norm: no bias, no mean subtraction, fp32 variance."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        variance = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                            keepdims=True)
        hidden = x * jax.lax.rsqrt(variance + self.eps).astype(x.dtype)
        return (weight * hidden).astype(x.dtype)


class SwishLayerNorm(nn.Module):
    """silu(LayerNorm(x)) — used by RQ-VAE encoder/decoder MLPs and HSTU."""
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        normed = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32)(x)
        return nn.silu(normed).astype(x.dtype)
