"""Sinkhorn-Knopp optimal-transport assignment for balanced codebook usage.

Parity target: ``/root/reference/genrec/models/rqvae.py:85-110``
(``_sinkhorn_knopp``): entropy-regularised OT between batch rows and codebook
columns, fixed iteration count, no gradients. The fixed-size iteration maps
directly onto ``lax.fori_loop``; the whole routine is wrapped in
``stop_gradient`` to mirror the reference's ``@torch.no_grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinkhorn_knopp(cost: jnp.ndarray, row_marginals: jnp.ndarray,
                   col_marginals: jnp.ndarray, eps: float = 0.05,
                   max_iter: int = 50) -> jnp.ndarray:
    """Return the (B, K) transport plan for ``cost`` with given marginals."""
    cost = cost.astype(jnp.float32)
    K = jnp.exp(-cost / eps)

    def body(_, uv):
        u, v = uv
        u = row_marginals / (K @ v + 1e-8)
        v = col_marginals / (K.T @ u + 1e-8)
        return u, v

    u0 = jnp.ones_like(row_marginals, dtype=jnp.float32)
    v0 = jnp.ones_like(col_marginals, dtype=jnp.float32)
    u, v = jax.lax.fori_loop(0, max_iter, body, (u0, v0))
    plan = u[:, None] * K * v[None, :]
    return jax.lax.stop_gradient(plan)
