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


# ---------------------------------------------------------------------------
# vocab-parallel variant (Megatron-style): table sharded over a mesh axis
# ---------------------------------------------------------------------------

def _local_stats(x, w_loc, labels, v_off, V_loc, v_true, chunk):
    """Chunked (m, s, t) logsumexp stats of x against the LOCAL vocab rows
    ``[v_off, v_off + V_loc)``; t is nonzero only where this shard owns the
    label. Global ids ≥ ``v_true`` (host-side table padding) and local
    chunk-padding columns are masked out. All in fp32."""
    N = x.shape[0]
    nc = -(-V_loc // chunk)
    pad = nc * chunk - V_loc
    wp = jnp.pad(w_loc, ((0, pad), (0, 0))).astype(x.dtype)

    def step(carry, c):
        m, s, t = carry
        wc = jax.lax.dynamic_slice_in_dim(wp, c * chunk, chunk, axis=0)
        z = jax.lax.dot_general(x, wc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        loc = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        ids = v_off + loc                                    # global ids
        z = jnp.where((loc < V_loc) & (ids < v_true), z, -jnp.inf)
        m2 = jnp.maximum(m, jnp.max(z, axis=1))
        s = s * jnp.exp(m - m2) + jnp.sum(jnp.exp(z - m2[:, None]), axis=1)
        hit = labels[:, None] == ids
        t = t + jnp.sum(jnp.where(hit, z, 0.0), axis=1)
        return (m2, s, t), None

    init = (jnp.full((N,), -jnp.inf, jnp.float32),
            jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32))
    (m, s, t), _ = jax.lax.scan(step, init, jnp.arange(nc))
    return m, s, t


def _local_grads(x, w_loc, labels, lse, scale, v_off, V_loc, v_true, chunk):
    """(dx_partial, dw_loc) of this shard's vocab slice (fp32 dx)."""
    dt = x.dtype
    nc = -(-V_loc // chunk)
    pad = nc * chunk - V_loc
    wp = jnp.pad(w_loc, ((0, pad), (0, 0))).astype(dt)

    def step(dx, c):
        wc = jax.lax.dynamic_slice_in_dim(wp, c * chunk, chunk, axis=0)
        z = jax.lax.dot_general(x, wc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        loc = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        ids = v_off + loc
        live = (loc < V_loc) & (ids < v_true)
        p = jnp.where(live, jnp.exp(z - lse[:, None]), 0.0)
        hit = (labels[:, None] == ids).astype(jnp.float32)
        dz = ((p - hit) * scale[:, None]).astype(dt)
        dx = dx + jnp.dot(dz, wc, preferred_element_type=jnp.float32)
        dwc = jax.lax.dot_general(dz, x, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return dx, dwc

    dx, dw_chunks = jax.lax.scan(step, jnp.zeros(x.shape, jnp.float32),
                                 jnp.arange(nc))
    return dx, dw_chunks.reshape(nc * chunk, -1)[:V_loc]


def make_vocab_parallel_ce(mesh, *, data_axis: str = "data",
                           model_axis: str = "model",
                           ignore_index: int = -100, chunk: int = 2048):
    """Vocab-parallel fused CE over a (data, model) mesh.

    Returns ``loss_fn(x, w, labels) -> scalar`` where ``w (V, D)`` is (or
    will be) row-sharded over ``model_axis`` and ``x (N, D)`` /
    ``labels (N,)`` are row-sharded over ``data_axis``. Each shard scores
    its rows against its local vocab slice only; logsumexp statistics are
    combined with pmax/psum over the model axis and the mean over valid
    labels with psums over the data axis — the table itself never moves
    (vs. the replicated path, which under sharding would all-gather the
    full (V, D) table every step; at Qwen2.5's V=151936 that is ~0.5 GB
    bf16 per step per direction). Gradients flow through the collectives
    via a custom VJP that recomputes local chunks (same recipe as
    :func:`fused_linear_cross_entropy`).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_model = mesh.shape[model_axis]
    x_spec = P(data_axis, None)
    w_spec = P(model_axis, None)
    l_spec = P(data_axis)

    @jax.custom_vjp
    def loss_fn(x, w, labels):
        return _loss_fwd(x, w, labels)[0]

    def _pad_vocab(w):
        """Pad rows so the vocab axis divides the model axis; padded global
        ids are masked to -inf inside the shards."""
        V = w.shape[0]
        pad = -V % n_model
        return (jnp.pad(w, ((0, pad), (0, 0))) if pad else w), V

    def _body_fwd(x, w_loc, labels, v_true):
        V_loc = w_loc.shape[0]
        v_off = jax.lax.axis_index(model_axis) * V_loc
        labels = labels.astype(jnp.int32)
        m_l, s_l, t_l = _local_stats(x, w_loc, labels, v_off, V_loc,
                                     v_true, chunk)
        m = jax.lax.pmax(m_l, model_axis)
        s = jax.lax.psum(s_l * jnp.exp(m_l - m), model_axis)
        t = jax.lax.psum(t_l, model_axis)
        lse = m + jnp.log(s)
        valid = (labels != ignore_index).astype(jnp.float32)
        n_valid = jnp.maximum(jax.lax.psum(jnp.sum(valid), data_axis), 1.0)
        loss = jax.lax.psum(jnp.sum((lse - t) * valid), data_axis) / n_valid
        return loss, lse, valid, n_valid

    def _loss_fwd(x, w, labels):
        wp, V = _pad_vocab(w)
        fwd = shard_map(
            functools.partial(_body_fwd, v_true=V),
            mesh=mesh, in_specs=(x_spec, w_spec, l_spec),
            out_specs=(P(), P(data_axis), P(data_axis), P()),
            check_vma=False)
        loss, lse, valid, n_valid = fwd(x, wp, labels)
        return loss, (x, w, labels, lse, valid, n_valid)

    def _loss_bwd(res, g):
        x, w, labels, lse, valid, n_valid = res
        wp, V = _pad_vocab(w)

        def body(x, w_loc, labels, lse, valid, n_valid, g):
            V_loc = w_loc.shape[0]
            v_off = jax.lax.axis_index(model_axis) * V_loc
            scale = g * valid / n_valid
            dx_p, dw_loc = _local_grads(x, w_loc, labels.astype(jnp.int32),
                                        lse, scale, v_off, V_loc, V, chunk)
            dx = jax.lax.psum(dx_p, model_axis)      # all vocab shards
            dw = jax.lax.psum(dw_loc, data_axis)     # all row shards
            return dx.astype(x.dtype), dw

        bwd = shard_map(
            body, mesh=mesh,
            in_specs=(x_spec, w_spec, l_spec, P(data_axis), P(data_axis),
                      P(), P()),
            out_specs=(x_spec, w_spec), check_vma=False)
        dx, dw = bwd(x, wp, labels, lse, valid, n_valid,
                     jnp.asarray(g, jnp.float32))
        return dx[:x.shape[0]], dw[:w.shape[0]].astype(w.dtype), \
            np.zeros(labels.shape, jax.dtypes.float0)

    loss_fn.defvjp(_loss_fwd, _loss_bwd)
    return loss_fn
