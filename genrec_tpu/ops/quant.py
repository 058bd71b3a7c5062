"""Weight-only int8 quantization for serving.

The reference has no quantization/serving story (SURVEY §1: no serving
layer). For TPU deployment the dominant inference costs are weight HBM
residency and weight-streaming bandwidth; symmetric per-channel int8
halves both vs bf16 (4× vs fp32) at negligible quality cost for the
embedding tables and projection matrices that make up >95% of these
models' bytes.

Design: storage-side transform, not a model change. ``quantize_tree``
rewrites every large floating 2-D+ leaf into an ``{"int8_q", "int8_scale"}``
node; ``dequantize_tree`` maps it back — called *inside* the jitted serving
fn, so XLA fuses the ``int8 → f32 × scale`` upcast into the consumer matmul
and weights live in device HBM as int8. Scales are per output channel
(max-abs over axis 0), which keeps the matmul's per-column error unbiased.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Q_KEY = "int8_q"
S_KEY = "int8_scale"


def quantize_int8(w: jnp.ndarray) -> dict:
    """Symmetric per-channel (axis-0 max-abs) int8 quantization."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {Q_KEY: q, S_KEY: scale.astype(jnp.float32)}


def dequantize_int8(node: dict) -> jnp.ndarray:
    # fp32 out; model-level dtype plumbing casts to the compute dtype
    # (the same cast every flax module applies to its params)
    return node[Q_KEY].astype(jnp.float32) * node[S_KEY]


def is_quantized(node: Any) -> bool:
    return isinstance(node, dict) and Q_KEY in node


def quantize_tree(params: Any, min_size: int = 2 ** 16) -> Any:
    """Quantize every floating leaf with ≥ ``min_size`` elements and ≥ 2
    dims (tables, projection kernels); small leaves (norm scales, biases)
    stay exact."""

    def rule(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.size >= min_size
                and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)):
            return quantize_int8(leaf)
        return leaf

    return jax.tree_util.tree_map(rule, params)


def dequantize_tree(params: Any) -> Any:
    """Inverse of :func:`quantize_tree` — call inside jit so the upcast
    fuses into the consuming matmul/gather."""
    return jax.tree_util.tree_map(
        lambda n: dequantize_int8(n) if is_quantized(n) else n,
        params, is_leaf=is_quantized)


def tree_bytes(params: Any) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(x.nbytes for x in leaves if hasattr(x, "nbytes"))
