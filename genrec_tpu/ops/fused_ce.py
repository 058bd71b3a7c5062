"""Fused linear + cross-entropy: chunked-vocab loss without full logits.

The naive causal-LM loss materialises ``logits (B, L, V) fp32`` and a
same-sized ``log_softmax`` — at Qwen2.5 scale (V≈151k, B·L≈8k tokens)
that is ~5 GB of HBM traffic and residency *per tensor*, which dominates
the SFT step (reference loss path:
``/root/reference/genrec/models/lcrec.py:114-133`` via HF, which pays the
same cost). This op streams the vocabulary in chunks with an online
logsumexp, so the forward keeps only O(N) statistics, and a custom VJP
recomputes each chunk's logits in the backward to emit ``dx`` and ``dw``
directly — no (N, V) tensor ever exists in either pass.

Per chunk c (ids ``[c·K, (c+1)·K)``)::

    z_c = x @ w_cᵀ                      # (N, K) fp32 accumulate
    m' = max(m, rowmax(z_c));  s = s·e^{m-m'} + Σ e^{z_c - m'};  m = m'
    t += z_c[label]                      # one-hot dot, label in chunk

    loss = Σ_valid (m + log s - t) / n_valid

Backward per chunk: ``g_c = (softmax_c - onehot_c)·(∂L/n_valid)``,
``dx += g_c @ w_c``, ``dw_c = g_cᵀ @ x``.

Matmuls run in the model dtype with fp32 accumulation (same numerics as
the unfused ``x @ wteᵀ`` path); the summation order of the logsumexp
differs from one-shot softmax by ~1 ulp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _chunk_ids(c: jnp.ndarray, chunk: int, n: int) -> jnp.ndarray:
    """(1, chunk) int32 global vocab ids of chunk ``c`` (2D: TPU-friendly)."""
    del n
    return c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)


def _take_chunk(w: jnp.ndarray, c: jnp.ndarray, chunk: int,
                vocab_major: bool) -> jnp.ndarray:
    """w chunk as (chunk, D) regardless of the stored layout."""
    if vocab_major:                       # w: (Vp, D)
        return jax.lax.dynamic_slice_in_dim(w, c * chunk, chunk, axis=0)
    # w: (D, Vp) — slice lanes, transpose the small chunk only
    return jax.lax.dynamic_slice_in_dim(w, c * chunk, chunk, axis=1).T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_linear_cross_entropy(x: jnp.ndarray, w: jnp.ndarray,
                               labels: jnp.ndarray, ignore_index: int = -100,
                               chunk: int = 4096,
                               vocab_major: bool = True) -> jnp.ndarray:
    """Mean CE of ``logits = x @ w`` against ``labels`` without logits.

    x: (N, D) tokens (any float dtype; matmuls accumulate fp32).
    w: (V, D) if ``vocab_major`` (embedding-table layout, the tied-head
       case) else (D, V) (``nn.Dense`` kernel layout).
    labels: (N,) int; ``ignore_index`` entries contribute nothing.
    Returns the scalar mean over non-ignored labels (0.0 if none),
    matching ``-(logp[label]·keep).sum() / max(keep.sum(), 1)``.
    """
    loss, _ = _fwd(x, w, labels, ignore_index, chunk, vocab_major)
    return loss


def _pad_w(w, chunk, vocab_major):
    V = w.shape[0] if vocab_major else w.shape[1]
    nc = -(-V // chunk)
    pad = nc * chunk - V
    if pad:
        cfg = ((0, pad), (0, 0)) if vocab_major else ((0, 0), (0, pad))
        w = jnp.pad(w, cfg)
    return w, nc, V


def _fwd(x, w, labels, ignore_index, chunk, vocab_major):
    N = x.shape[0]
    dt = x.dtype
    wp, nc, V = _pad_w(w, chunk, vocab_major)
    wp = wp.astype(dt)
    labels = labels.astype(jnp.int32)

    def step(carry, c):
        m, s, t = carry
        wc = _take_chunk(wp, c, chunk, vocab_major)            # (chunk, D)
        z = jax.lax.dot_general(x, wc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ids = _chunk_ids(c, chunk, nc)                         # (1, chunk)
        z = jnp.where(ids < V, z, -jnp.inf)                    # mask pad cols
        m2 = jnp.maximum(m, jnp.max(z, axis=1))
        s = s * jnp.exp(m - m2) + jnp.sum(jnp.exp(z - m2[:, None]), axis=1)
        hit = (labels[:, None] == ids).astype(jnp.float32)     # (N, chunk)
        t = t + jnp.sum(jnp.where(hit > 0, z, 0.0), axis=1)
        return (m2, s, t), None

    init = (jnp.full((N,), -jnp.inf, jnp.float32),
            jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32))
    (m, s, t), _ = jax.lax.scan(step, init, jnp.arange(nc))
    lse = m + jnp.log(s)
    valid = (labels != ignore_index).astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    loss = jnp.sum((lse - t) * valid) / n_valid
    return loss, (x, w, labels, lse, valid, n_valid)


def _bwd(ignore_index, chunk, vocab_major, res, g):
    x, w, labels, lse, valid, n_valid = res
    dt = x.dtype
    wp, nc, V = _pad_w(w, chunk, vocab_major)
    wpc = wp.astype(dt)
    scale = (g * valid / n_valid).astype(jnp.float32)          # (N,)

    def step(dx, c):
        wc = _take_chunk(wpc, c, chunk, vocab_major)           # (chunk, D)
        z = jax.lax.dot_general(x, wc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ids = _chunk_ids(c, chunk, nc)
        p = jnp.where(ids < V, jnp.exp(z - lse[:, None]), 0.0)
        hit = (labels[:, None] == ids).astype(jnp.float32)
        dz = ((p - hit) * scale[:, None]).astype(dt)           # (N, chunk)
        dx = dx + jnp.dot(dz, wc,
                          preferred_element_type=jnp.float32)
        dwc = jax.lax.dot_general(dz, x, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return dx, dwc                                         # (chunk, D)

    dx, dw_chunks = jax.lax.scan(step, jnp.zeros(x.shape, jnp.float32),
                                 jnp.arange(nc))
    dw = dw_chunks.reshape(nc * chunk, -1)[:V]                 # (V, D)
    if not vocab_major:
        dw = dw.T
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            np.zeros(labels.shape, jax.dtypes.float0))


fused_linear_cross_entropy.defvjp(_fwd, _bwd)
