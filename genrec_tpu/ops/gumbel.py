"""Gumbel-softmax sampling.

Parity target: ``/root/reference/genrec/modules/gumbel.py:11-47``, re-expressed
with explicit JAX PRNG keys (the reference draws from torch's global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gumbel(key: jax.Array, shape, eps: float = 1e-20,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Sample Gumbel(0, 1) noise."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax_sample(key: jax.Array, logits: jnp.ndarray,
                          temperature: float) -> jnp.ndarray:
    """Draw a soft sample from the Gumbel-Softmax distribution."""
    y = logits + sample_gumbel(key, logits.shape, dtype=logits.dtype)
    return jax.nn.softmax(y / temperature, axis=-1)
