"""Pallas TPU kernel: fused multi-head attention for short sequences.

The TIGER/T5 hot loop (``/root/reference/genrec/modules/transformer.py:
106-159``) materialises the (B, H, S, S) score tensor, the softmax output
and a (B, H, S, S) uint32 dropout mask in HBM — at the paper config
(B=256, H=6, S=61) that is ~5 GB of HBM traffic per train step (measured,
round-2 profile), on a step that is bandwidth-bound. This kernel keeps the
whole ``scores → +bias → +mask → softmax → dropout → @V`` chain in VMEM:

- grid over (batch-blocks × head-groups); each cell runs small 2-D MXU
  matmuls per sample (sequences are short: S ≤ a few hundred — semantic-ID
  histories, not documents — so one (S, S) tile per sample fits trivially);
- the relative-position bias and any additive 2-D mask arrive pre-combined
  as one (H, Sq, Sk) operand, the key-padding mask as additive (B, Sk);
- attention dropout uses a counter-based hash (murmur3 finalizer over the
  global element index, seeded per step): pure vector math, so the backward
  pass regenerates the *identical* mask from the same seed — the stateful
  ``pltpu.prng_*`` stream is NOT reproducible across two different kernels
  (measured on hardware), a counter-based generator is, and the
  (B, H, S, S) mask never exists in HBM in either direction;
- the custom VJP recomputes probabilities flash-style and accumulates the
  bias gradient across batch-blocks inside the grid (batch is the inner,
  sequential grid dimension), emitting a (H, Sq, Sk) dbias directly.

Falls back to an identical pure-XLA computation on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
INTERPRET = False   # tests flip this to run the kernel on CPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _keep_threshold(rate: float) -> int:
    """uint32 threshold: bits >= threshold  <=>  keep (prob 1-rate)."""
    return min(int(rate * 4294967296.0), 4294967295)


def hash_keep_mask(seed, draw_index, shape, rate: float):
    """Deterministic (Sq, Sk) keep-mask: murmur3 finalizer of the global
    element counter mixed with ``seed``. Counter-based (stateless), so any
    kernel — forward, backward, interpreter — regenerates the same mask.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = (draw_index.astype(jnp.uint32) * jnp.uint32(shape[0]) + rows) \
        * jnp.uint32(shape[1]) + cols
    h = h ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h * jnp.uint32(0xCC9E2D51)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h >= jnp.uint32(_keep_threshold(rate))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, kpad_ref, o_ref, *,
                bb: int, hb: int, dh: int, scale: float, rate: float,
                n_heads: int):
    ib = pl.program_id(0)
    hg = pl.program_id(1)
    seed = seed_ref[0]
    inv_keep = 1.0 / (1.0 - rate)
    for i in range(bb):
        kpad = kpad_ref[i, :][None, :]                     # (1, Sk)
        for j in range(hb):
            q = q_ref[i, :, j * dh:(j + 1) * dh]           # (Sq, Dh)
            k = k_ref[i, :, j * dh:(j + 1) * dh]           # (Sk, Dh)
            v = v_ref[i, :, j * dh:(j + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + bias_ref[j] + kpad                     # (Sq, Sk)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            if rate > 0.0:
                draw = (ib * bb + i) * n_heads + hg * hb + j
                keep = hash_keep_mask(seed, jnp.uint32(draw), p.shape, rate)
                p = jnp.where(keep, p * inv_keep, 0.0)
            o = jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[i, :, j * dh:(j + 1) * dh] = o.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel — grid (head-groups, batch-blocks): batch is the inner
# sequential dimension so the dbias output block accumulates in VMEM.
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, kpad_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                bb: int, hb: int, dh: int, scale: float, rate: float,
                n_heads: int):
    hg = pl.program_id(0)
    ib = pl.program_id(1)
    seed = seed_ref[0]
    inv_keep = 1.0 / (1.0 - rate)

    @pl.when(ib == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for i in range(bb):
        kpad = kpad_ref[i, :][None, :]
        for j in range(hb):
            sl = slice(j * dh, (j + 1) * dh)
            q = q_ref[i, :, sl]
            k = k_ref[i, :, sl]
            v = v_ref[i, :, sl]
            do = do_ref[i, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + bias_ref[j] + kpad
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)     # (Sq, Sk) f32
            if rate > 0.0:
                draw = (ib * bb + i) * n_heads + hg * hb + j
                keep = hash_keep_mask(seed, jnp.uint32(draw), p.shape, rate)
                pd = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pd = p
            # dv = pd^T @ do
            dv = jax.lax.dot_general(
                pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_ref[i, :, sl] = dv.astype(dv_ref.dtype)
            # dp (through dropout) then softmax VJP
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (Sq, Sk)
            if rate > 0.0:
                dp = jnp.where(keep, dp * inv_keep, 0.0)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[j] += ds
            dsc = ds.astype(q.dtype)
            dq = jax.lax.dot_general(
                dsc, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[i, :, sl] = dq.astype(dq_ref.dtype)
            dk = jax.lax.dot_general(
                dsc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk_ref[i, :, sl] = dk.astype(dk_ref.dtype)


# ---------------------------------------------------------------------------
# XLA fallback (CPU, and the parity oracle in tests)
# ---------------------------------------------------------------------------

def fused_attention_xla(q, k, v, bias, kpad, seed, rate: float,
                        n_heads: int):
    """Identical math via plain XLA (dropout uses the jax PRNG: the mask
    pattern differs from the TPU kernel but the distribution matches)."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    dh = HD // n_heads

    def split(x, s):
        return x.reshape(B, s, n_heads, dh).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q, Sq), split(k, Sk), split(v, Sk)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * (dh ** -0.5)
    s = s + bias[None] + kpad[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        keep = jax.random.bernoulli(key, 1.0 - rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.transpose(0, 2, 1, 3).reshape(B, Sq, HD)


# ---------------------------------------------------------------------------
# public entry point with custom VJP
# ---------------------------------------------------------------------------

def _block_b(s_pad: int) -> int:
    if s_pad <= 128:
        return 8
    if s_pad <= 256:
        return 4
    return 1


def _pad_args(q, k, v, bias, kpad, bb):
    """Pad seq dims to sublane multiples and batch to the block size."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    sqp, skp = _round_up(Sq, 16), _round_up(Sk, 16)
    bp = _round_up(B, bb)
    q = jnp.pad(q, ((0, bp - B), (0, sqp - Sq), (0, 0)))
    k = jnp.pad(k, ((0, bp - B), (0, skp - Sk), (0, 0)))
    v = jnp.pad(v, ((0, bp - B), (0, skp - Sk), (0, 0)))
    bias = jnp.pad(bias, ((0, 0), (0, sqp - Sq), (0, skp - Sk)))
    # padded keys masked out; padded batch rows are all-masked-safe because
    # bias/kpad stay finite on at least column 0
    kpad = jnp.pad(kpad, ((0, bp - B), (0, skp - Sk)),
                   constant_values=NEG_INF)
    return q, k, v, bias, kpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_attention(q, k, v, bias, kpad, seed, rate, n_heads):
    out, _ = _fused_attention_fwd(q, k, v, bias, kpad, seed, rate, n_heads)
    return out


def _plan(q, k, n_heads):
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    dh = HD // n_heads
    sqp, skp = _round_up(Sq, 16), _round_up(Sk, 16)
    bb = _block_b(max(sqp, skp))
    hb = max(1, 128 // dh)
    while n_heads % hb:
        hb -= 1
    return B, Sq, Sk, HD, dh, sqp, skp, bb, hb


def _fused_attention_fwd(q, k, v, bias, kpad, seed, rate, n_heads):
    B, Sq, Sk, HD, dh, sqp, skp, bb, hb = _plan(q, k, n_heads)
    qp, kp, vp, biasp, kpadp = _pad_args(q, k, v, bias, kpad, bb)
    bp = qp.shape[0]
    grid = (bp // bb, n_heads // hb)
    kernel = functools.partial(
        _fwd_kernel, bb=bb, hb=hb, dh=dh, scale=dh ** -0.5, rate=rate,
        n_heads=n_heads)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb, sqp, hb * dh), lambda i, h, *_: (i, 0, h)),
                pl.BlockSpec((bb, skp, hb * dh), lambda i, h, *_: (i, 0, h)),
                pl.BlockSpec((bb, skp, hb * dh), lambda i, h, *_: (i, 0, h)),
                pl.BlockSpec((hb, sqp, skp), lambda i, h, *_: (h, 0, 0)),
                pl.BlockSpec((bb, skp), lambda i, h, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bb, sqp, hb * dh),
                                   lambda i, h, *_: (i, 0, h)),
        ),
        out_shape=jax.ShapeDtypeStruct((bp, sqp, HD), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * n_heads * sqp * skp * dh,
            bytes_accessed=4 * bp * sqp * HD * q.dtype.itemsize,
            transcendentals=bp * n_heads * sqp * skp),
        interpret=INTERPRET,
    )(jnp.asarray([seed], jnp.int32).reshape(1),
      qp, kp, vp, biasp, kpadp)
    out = out[:B, :Sq]
    return out, (q, k, v, bias, kpad, seed)


def _fused_attention_bwd(rate, n_heads, res, g):
    q, k, v, bias, kpad, seed = res
    B, Sq, Sk, HD, dh, sqp, skp, bb, hb = _plan(q, k, n_heads)
    qp, kp, vp, biasp, kpadp = _pad_args(q, k, v, bias, kpad, bb)
    bp = qp.shape[0]
    gp = jnp.pad(g, ((0, bp - B), (0, sqp - Sq), (0, 0)))
    grid = (n_heads // hb, bp // bb)
    kernel = functools.partial(
        _bwd_kernel, bb=bb, hb=hb, dh=dh, scale=dh ** -0.5, rate=rate,
        n_heads=n_heads)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb, sqp, hb * dh), lambda h, i, *_: (i, 0, h)),
                pl.BlockSpec((bb, skp, hb * dh), lambda h, i, *_: (i, 0, h)),
                pl.BlockSpec((bb, skp, hb * dh), lambda h, i, *_: (i, 0, h)),
                pl.BlockSpec((hb, sqp, skp), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((bb, skp), lambda h, i, *_: (i, 0)),
                pl.BlockSpec((bb, sqp, hb * dh), lambda h, i, *_: (i, 0, h)),
            ],
            out_specs=[
                pl.BlockSpec((bb, sqp, hb * dh), lambda h, i, *_: (i, 0, h)),
                pl.BlockSpec((bb, skp, hb * dh), lambda h, i, *_: (i, 0, h)),
                pl.BlockSpec((bb, skp, hb * dh), lambda h, i, *_: (i, 0, h)),
                pl.BlockSpec((hb, sqp, skp), lambda h, i, *_: (h, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bp, sqp, HD), q.dtype),
            jax.ShapeDtypeStruct((bp, skp, HD), k.dtype),
            jax.ShapeDtypeStruct((bp, skp, HD), v.dtype),
            jax.ShapeDtypeStruct((n_heads, sqp, skp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bp * n_heads * sqp * skp * dh,
            bytes_accessed=8 * bp * sqp * HD * q.dtype.itemsize,
            transcendentals=bp * n_heads * sqp * skp),
        interpret=INTERPRET,
    )(jnp.asarray([seed], jnp.int32).reshape(1),
      qp, kp, vp, biasp, kpadp, gp)
    dseed = np.zeros((), jax.dtypes.float0)
    return (dq[:B, :Sq], dk[:B, :Sk], dv[:B, :Sk],
            dbias[:, :Sq, :Sk], jnp.zeros_like(kpad), dseed)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention_supported(q_shape, n_heads: int,
                              platform: Optional[str] = None) -> bool:
    """The kernel handles short static sequences with Dh a power-of-two
    lane-friendly size; anything else uses the XLA path."""
    if not INTERPRET:
        platform = platform or jax.default_backend()
        if platform != "tpu":
            return False
    B, S, HD = q_shape
    if HD % n_heads:
        return False
    dh = HD // n_heads
    return dh % 8 == 0 and dh <= 256 and S <= 1024


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray], kpad: Optional[jnp.ndarray],
                    *, n_heads: int, seed=0, dropout_rate: float = 0.0,
                    force_xla: bool = False) -> jnp.ndarray:
    """Fused MHA: ``softmax(q kᵀ/√dh + bias + kpad) @ v`` per head.

    q: (B, Sq, H·Dh); k, v: (B, Sk, H·Dh) — head-interleaved layout, i.e.
    exactly the Dense-projection output (no (B, H, S, D) transpose needed).
    bias: (H, Sq, Sk) additive, batch-independent (relative-position bias
    and/or causal mask), or None. kpad: (B, Sk) additive float
    (0 / -1e9), or None. seed: int32 scalar for attention dropout.
    """
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    if bias is None:
        bias = jnp.zeros((n_heads, Sq, Sk), jnp.float32)
    if kpad is None:
        kpad = jnp.zeros((B, Sk), jnp.float32)
    bias = bias.astype(jnp.float32)
    kpad = kpad.astype(jnp.float32)
    if force_xla or not fused_attention_supported(q.shape, n_heads):
        return fused_attention_xla(q, k, v, bias, kpad, seed,
                                   dropout_rate, n_heads)
    seed = jnp.asarray(seed, jnp.int32)
    return _fused_attention(q, k, v, bias, kpad, seed, dropout_rate, n_heads)
