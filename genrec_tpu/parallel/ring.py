"""Ring attention: sequence/context parallelism over a mesh axis.

The reference has no sequence parallelism (SURVEY §2.5 / §5: max sequence
is ~61 tokens, so it never needed one). This is the TPU-native long-context
tier for the LLM backbone (LCRec/NoteLLM at real prompt lengths): the
sequence axis of activations is sharded over the ``model`` mesh axis, every
pointwise op (norms, projections, SwiGLU) is sequence-parallel for free via
GSPMD propagation, and attention — the one op that mixes positions — runs
as a **ring**: each device holds its local q/k/v block and the k/v blocks
rotate around the mesh axis with ``ppermute`` while an online-softmax
accumulator folds each block in. Peak memory per device is O(L·Lp) scores
instead of O(L²), and the k/v transfers ride neighbour ICI links
overlapping with the block matmuls.

Causal masking is done on *global* positions (block offset × local length +
local index), so the result is exactly the dense causal softmax attention —
verified against it in ``tests/test_ring.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

NEG_INF = -1e9


def _ring_body(q, k, v, kpad, axis_name: str, n_shards: int, scale: float,
               causal: bool):
    """Per-device ring loop. q/k/v: (B, H, Lp, Dh); kpad: (B, Lp) additive
    fp32 mask (0 valid / -1e9 pad) for the *local* key block."""
    B, H, Lp, Dh = q.shape
    idx = jax.lax.axis_index(axis_name)
    qpos = idx * Lp + jnp.arange(Lp)                       # global q positions
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    qf = q.astype(jnp.float32) * scale
    m = jnp.full((B, H, Lp), NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, Lp), jnp.float32)
    acc = jnp.zeros((B, H, Lp, Dh), jnp.float32)

    def step(carry, r):
        m, l, acc, k, v, kpad = carry
        # this k/v block originated on device (idx - r) mod n_shards
        src = (idx - r) % n_shards
        kpos = src * Lp + jnp.arange(Lp)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32))
        s = s + kpad[:, None, None, :]
        if causal:
            s = s + jnp.where(kpos[None, :] > qpos[:, None], NEG_INF,
                              0.0)[None, None]
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        kpad = jax.lax.ppermute(kpad, axis_name, perm)
        return (m_new, l_new, acc_new, k, v, kpad), None

    (m, l, acc, *_), _ = jax.lax.scan(
        step, (m, l, acc, k, v, kpad), jnp.arange(n_shards))
    # causal rows always see at least the query itself unless the query is
    # itself padding; clamp keeps padded rows finite (masked downstream)
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kpad: jnp.ndarray, mesh: Mesh,
                   axis: str = MODEL_AXIS, causal: bool = True,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """Causal softmax attention with the sequence axis sharded over
    ``axis``. Global shapes: q/k/v (B, H, L, Dh), kpad (B, L) additive fp32
    key mask. Batch shards over ``data``. Returns (B, H, L, Dh) with the
    same shardings."""
    n = mesh.shape[axis]
    if q.shape[2] % n:
        raise ValueError(f"sequence {q.shape[2]} not divisible by {axis}={n}")
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    body = functools.partial(_ring_body, axis_name=axis, n_shards=n,
                             scale=scale, causal=causal)
    spec4 = P(DATA_AXIS, None, axis, None)
    spec2 = P(DATA_AXIS, axis)
    return shard_map(body, mesh=mesh,
                     in_specs=(spec4, spec4, spec4, spec2),
                     out_specs=spec4, check_vma=False)(q, k, v, kpad)


def _ring_silu_body(q, k, v, pos_table, time_table, ts, pad,
                    axis_name: str, n_shards: int, max_distance: int,
                    has_time: bool):
    """Per-device SiLU-attention ring. Unlike softmax, SiLU attention has
    no row normalisation (reference hstu.py:261-263), so folding rotated
    k/v blocks is a plain sum — the ring is *exact*, no online-softmax
    state. Biases are recomputed per step from global positions /
    timestamps (bucket gathers), which replaces the (B, L, L, NB) temporal
    one-hot — quadratic in L and precisely what long-history sequence
    parallelism must avoid."""
    from genrec_tpu.models.hstu import _position_bucket, _temporal_bucket
    B, H, Lp, Dh = q.shape
    idx = jax.lax.axis_index(axis_name)
    qpos = idx * Lp + jnp.arange(Lp)
    ts_q = ts
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    qf = q.astype(jnp.float32)
    n_pos_buckets = pos_table.shape[0]

    def step(carry, r):
        acc, k, v, pad, ts_k = carry
        src = (idx - r) % n_shards
        kpos = src * Lp + jnp.arange(Lp)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32))
        # reference orientation quirk (key_pos - query_pos, clamped at 0 —
        # see models/hstu.py comment): replicated on global positions
        pb = _position_bucket(kpos[None, :] - qpos[:, None],
                              n_pos_buckets, max_distance)       # (Lp, Lp)
        s = s + jnp.take(pos_table.astype(jnp.float32), pb,
                         axis=0).transpose(2, 0, 1)[None]
        if has_time:
            diff = ts_q[:, :, None] - ts_k[:, None, :]
            tb = _temporal_bucket(diff, time_table.shape[0])
            s = s + jnp.take(time_table.astype(jnp.float32), tb,
                             axis=0).transpose(0, 3, 1, 2)
        s = jnp.where((kpos[None, :] > qpos[:, None])[None, None],
                      NEG_INF, s)                                # causal
        s = jnp.where(pad[:, None, None, :], NEG_INF, s)         # key pad
        acc = acc + jnp.einsum("bhqk,bhkd->bhqd", jax.nn.silu(s),
                               v.astype(jnp.float32))
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        pad = jax.lax.ppermute(pad, axis_name, perm)
        ts_k = jax.lax.ppermute(ts_k, axis_name, perm)
        return (acc, k, v, pad, ts_k), None

    acc = jnp.zeros((B, H, Lp, Dh), jnp.float32)
    (acc, *_), _ = jax.lax.scan(step, (acc, k, v, pad, ts),
                                jnp.arange(n_shards))
    return acc.astype(q.dtype)


def make_ring_silu_attention(mesh: Mesh, axis: str = MODEL_AXIS):
    """Sequence-parallel HSTU attention: plug into
    ``HSTU(attn_impl=make_ring_silu_attention(mesh))`` and feed
    (batch, sequence)-sharded inputs. Matches the dense layer exactly
    (``tests/test_ring.py``)."""

    def attn(q, k, v, pos_table, time_table, timestamps, padding_mask,
             max_position_distance):
        n = mesh.shape[axis]
        B, H, L, Dh = q.shape
        if L % n:
            raise ValueError(f"sequence {L} not divisible by {axis}={n}")
        has_time = time_table is not None
        if not has_time:
            time_table = jnp.zeros((1, H), jnp.float32)
        if timestamps is None:
            timestamps = jnp.zeros((B, L), jnp.int32)
        body = functools.partial(
            _ring_silu_body, axis_name=axis, n_shards=n,
            max_distance=max_position_distance, has_time=has_time)
        spec4 = P(DATA_AXIS, None, axis, None)
        spec2 = P(DATA_AXIS, axis)
        return shard_map(
            body, mesh=mesh,
            in_specs=(spec4, spec4, spec4, P(), P(), spec2, spec2),
            out_specs=spec4, check_vma=False,
        )(q, k, v, pos_table, time_table, timestamps, padding_mask)

    return attn


class SequenceParallelLM:
    """Context-parallel executor for
    :class:`~genrec_tpu.models.llm.CausalLM`: activations shard (batch,
    sequence) over the (data, model) mesh; attention runs as a ring. Same
    plain param tree as the model (no layout change), same fused chunked CE
    loss — the loss gathers the sequence axis (it reduces over all
    positions anyway).

    Reference equivalent: none (SURVEY §2.5 SP row: "No"); this is the TPU
    tier for long-prompt LCRec SFT beyond one chip's activation memory.
    """

    def __init__(self, model, mesh: Mesh, axis: str = MODEL_AXIS):
        import flax.linen as nn
        from genrec_tpu.models.llm import LlmBlock
        self.model = model
        self.mesh = mesh
        self.axis = axis
        attn = functools.partial(ring_attention, mesh=mesh, axis=axis)
        block_cls = nn.remat(LlmBlock) if model.remat else LlmBlock
        self._block = block_cls(model.d_model, model.n_heads,
                               model.n_kv_heads, model.ff_dim,
                               lora_rank=model.lora_rank,
                               lora_alpha=model.lora_alpha,
                               rope_theta=model.rope_theta,
                               dtype=model.dtype, attn_impl=attn)

    def shard_inputs(self, *arrays):
        """device_put (B, L)-shaped inputs with (data, model) sharding."""
        from jax.sharding import NamedSharding
        s = NamedSharding(self.mesh, P(DATA_AXIS, self.axis))
        return tuple(jax.device_put(a, s) for a in arrays)

    def hidden(self, params: dict, input_ids: jnp.ndarray,
               attention_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        m = self.model
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        x = jnp.take(params["wte"], input_ids, axis=0).astype(m.dtype)
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        kpad = jnp.where(attention_mask == 0, NEG_INF, 0.0).astype(
            jnp.float32)
        for i in range(m.n_layers):
            x, _ = self._block.apply({"params": params[f"layer_{i}"]},
                                     x, positions, None,
                                     fused_mask=(None, kpad))
        from genrec_tpu.nn.normalize import RMSNorm
        return RMSNorm(m.d_model).apply({"params": params["final_norm"]}, x)

    def loss(self, params: dict, input_ids: jnp.ndarray,
             attention_mask: Optional[jnp.ndarray],
             labels: jnp.ndarray) -> jnp.ndarray:
        from genrec_tpu.models.llm import causal_lm_fused_ce
        x = self.hidden(params, input_ids, attention_mask)
        return causal_lm_fused_ce(
            self.model, x, labels, params["wte"],
            None if self.model.tie_embeddings
            else params["lm_head"]["kernel"])
