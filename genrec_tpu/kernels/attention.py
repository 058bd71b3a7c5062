"""Pallas TPU kernels for the attention hot path (hybrid design).

The TIGER/T5 attention chain (``/root/reference/genrec/modules/
transformer.py:106-159``) is HBM-bandwidth-bound at the paper config:
XLA materialises fp32 (B, H, S, S) scores, a uint32 dropout-bit tensor and
a pred mask per layer, ~5 GB/step total (round-2 profile). Two designs were
measured on hardware:

1. a fully-fused per-sample attention kernel (scores→softmax→dropout→@V in
   one pallas program) — numerically exact but ~10× slower than XLA's
   *batched* MXU matmuls at (61, 64) tile sizes; rejected after profiling;
2. this hybrid: XLA keeps the batched q·kᵀ and p·v einsums (what the MXU
   pipeline is best at), and one pallas kernel fuses everything between
   them — fp32 upcast+scale, additive (H, Sq, Sk) bias (relative-position
   + causal), additive (B, Sk) key-padding mask, fp32 softmax, and
   dropout whose keep-mask is a counter-based hash (murmur3 finalizer over
   the global element index). The mask is *regenerated* in the custom
   VJP from the same seed — counter-based beats the stateful
   ``pltpu.prng_*`` stream, which is not reproducible across different
   kernels (measured on hardware) — so neither fp32 scores, dropout bits
   nor pred masks ever reach HBM; the backward reads only the saved bf16
   raw scores and emits the (H, Sq, Sk) bias gradient directly by
   accumulating ds over the sequential batch grid dimension.

CPU falls back to identical-math XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

NEG_INF = -1e9
INTERPRET = False   # tests flip this to run the kernels on CPU


def _disabled(extra_var: str = "") -> bool:
    import os
    if os.environ.get("GENREC_TPU_NO_FUSED_KERNELS", "") not in ("", "0"):
        return True
    return bool(extra_var) and os.environ.get(extra_var, "") not in ("", "0")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _keep_threshold(rate: float) -> int:
    """uint32 threshold: bits >= threshold  <=>  keep (prob 1-rate)."""
    return min(int(rate * 4294967296.0), 4294967295)


def _fast_hash_enabled() -> bool:
    import os
    return os.environ.get("GENREC_TPU_FAST_HASH", "") not in ("", "0")


def hash_keep_mask(seed, draw_index, shape, rate: float):
    """Deterministic keep-mask: murmur3 finalizer of the global element
    counter mixed with ``seed``. Counter-based (stateless), so any kernel —
    forward, backward, interpreter — regenerates the same mask.

    ``GENREC_TPU_FAST_HASH=1`` (opt-in A/B): a 2-round finalizer — dropout
    masks cost a measured 9% of the TIGER step
    (GENREC_TPU_BENCH_DROPOUT=0 A/B, r4), most of it these VPU op chains
    run twice (fwd + recompute-in-backward). Two multiply-xorshift rounds
    keep full-width avalanche for the threshold compare; masks differ from
    the 3-round default, so the flag must be consistent within a run
    (which it is: both passes call this one function).
    """
    idx = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for d in reversed(range(len(shape))):
        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, shape, d) \
            * jnp.uint32(stride)
        stride *= shape[d]
    h = draw_index.astype(jnp.uint32) * jnp.uint32(stride & 0xFFFFFFFF) + idx
    h = h ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    h = h * jnp.uint32(0xCC9E2D51)
    h = h ^ (h >> 16)
    if not _fast_hash_enabled():
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h >= jnp.uint32(_keep_threshold(rate))


# ---------------------------------------------------------------------------
# forward: p = dropout(softmax(s·scale + bias + kpad))
# ---------------------------------------------------------------------------

def _softmax_fwd_kernel(seed_ref, s_ref, bias_ref, kpad_ref, p_ref, *,
                        scale: float, rate: float):
    s = s_ref[:].astype(jnp.float32) * scale          # (bb, hb, Sq, Sk)
    s = s + bias_ref[:][None] + kpad_ref[:][:, :, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if rate > 0.0:
        cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        keep = hash_keep_mask(seed_ref[0], cell, p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    p_ref[:] = p.astype(p_ref.dtype)


# ---------------------------------------------------------------------------
# backward: recompute p + mask, softmax VJP, accumulate dbias over batch
# ---------------------------------------------------------------------------

def _softmax_bwd_kernel(seed_ref, s_ref, bias_ref, kpad_ref, g_ref,
                        ds_ref, dbias_ref, *, scale: float, rate: float):
    hg = pl.program_id(0)
    ib = pl.program_id(1)     # batch is the inner, sequential grid dim

    @pl.when(ib == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    s = s_ref[:].astype(jnp.float32) * scale
    s = s + bias_ref[:][None] + kpad_ref[:][:, :, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    g = g_ref[:].astype(jnp.float32)
    if rate > 0.0:
        cell = hg * pl.num_programs(1) + ib   # same mapping as forward
        keep = hash_keep_mask(seed_ref[0], cell, p.shape, rate)
        g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
    ds = p * (g - jnp.sum(g * p, axis=-1, keepdims=True))
    dbias_ref[:] += jnp.sum(ds, axis=0)
    # d(s_raw) = ds · scale (the upcast multiplied s_raw by scale)
    ds_ref[:] = (ds * scale).astype(ds_ref.dtype)


def _pad_sbk(s, bias, kpad, bb):
    B, H, Sq, Sk = s.shape
    bp = _round_up(B, bb)
    sqp, skp = _round_up(Sq, 8), _round_up(Sk, 8)
    s = jnp.pad(s, ((0, bp - B), (0, 0), (0, sqp - Sq), (0, skp - Sk)))
    bias = jnp.pad(bias, ((0, 0), (0, sqp - Sq), (0, skp - Sk)))
    kpad = jnp.pad(kpad, ((0, bp - B), (0, skp - Sk)),
                   constant_values=NEG_INF)
    return s, bias, kpad


def _plan_blocks(h, sq, sk):
    """(bb, hb): the kernel holds ~6-8 fp32 intermediates of the block
    shape at once (upcast s, e, p, keep, g, ds + pipeline double-buffers);
    keep each ≲0.5 MB so the working set stays under the 16 MB VMEM scope.
    Batch blocks are powers of two so power-of-two batches are never
    padded (a bb of e.g. 5 padded B=256 to 260 and cost ~0.5 ms of pad
    ops per step — round-2 profile); heads split further for long
    sequences."""
    tile = _round_up(sq, 8) * _round_up(sk, 8) * 4
    hb = h
    while hb > 1 and hb * tile > (512 << 10):
        hb = (hb + 1) // 2
    while h % hb:
        hb += 1
    cap = min(8, max(1, (512 << 10) // max(hb * tile, 1)))
    bb = 1
    while bb * 2 <= cap:
        bb *= 2
    return bb, hb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_softmax(s, bias, kpad, seed, scale, rate):
    return _fused_softmax_fwd(s, bias, kpad, seed, scale, rate)[0]


def _fused_softmax_fwd(s, bias, kpad, seed, scale, rate):
    B, H, Sq, Sk = s.shape
    bb, hb = _plan_blocks(H, Sq, Sk)
    sp, biasp, kpadp = _pad_sbk(s, bias, kpad, bb)
    bp, _, sqp, skp = sp.shape
    kpadp = kpadp[:, None, :]                   # (bp, 1, skp)
    out = pl.pallas_call(
        functools.partial(_softmax_fwd_kernel, scale=scale, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H // hb, bp // bb),
            in_specs=[
                pl.BlockSpec((bb, hb, sqp, skp),
                             lambda h, i, *_: (i, h, 0, 0)),
                pl.BlockSpec((hb, sqp, skp), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((bb, 1, skp), lambda h, i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bb, hb, sqp, skp),
                                   lambda h, i, *_: (i, h, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(sp.shape, s.dtype),
        interpret=INTERPRET,
    )(jnp.asarray([seed], jnp.int32).reshape(1), sp, biasp, kpadp)
    return out[:B, :, :Sq, :Sk], (s, bias, kpad, seed)


def _fused_softmax_bwd(scale, rate, res, g):
    s, bias, kpad, seed = res
    B, H, Sq, Sk = s.shape
    bb, hb = _plan_blocks(H, Sq, Sk)
    sp, biasp, kpadp = _pad_sbk(s, bias, kpad, bb)
    bp, _, sqp, skp = sp.shape
    kpadp = kpadp[:, None, :]                   # (bp, 1, skp)
    gp = jnp.pad(g.astype(s.dtype),
                 ((0, bp - B), (0, 0), (0, sqp - Sq), (0, skp - Sk)))
    ds, dbias = pl.pallas_call(
        functools.partial(_softmax_bwd_kernel, scale=scale, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H // hb, bp // bb),
            in_specs=[
                pl.BlockSpec((bb, hb, sqp, skp),
                             lambda h, i, *_: (i, h, 0, 0)),
                pl.BlockSpec((hb, sqp, skp), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((bb, 1, skp), lambda h, i, *_: (i, 0, 0)),
                pl.BlockSpec((bb, hb, sqp, skp),
                             lambda h, i, *_: (i, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bb, hb, sqp, skp),
                             lambda h, i, *_: (i, h, 0, 0)),
                pl.BlockSpec((hb, sqp, skp), lambda h, i, *_: (h, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(sp.shape, s.dtype),
            jax.ShapeDtypeStruct((H, sqp, skp), jnp.float32),
        ],
        interpret=INTERPRET,
    )(jnp.asarray([seed], jnp.int32).reshape(1), sp, biasp, kpadp, gp)
    dseed = np.zeros((), jax.dtypes.float0)
    return (ds[:B, :, :Sq, :Sk], dbias[:, :Sq, :Sk],
            jnp.zeros_like(kpad), dseed)


_fused_softmax.defvjp(_fused_softmax_fwd, _fused_softmax_bwd)


# ---------------------------------------------------------------------------
# pure-XLA variant: same math, no custom call
# ---------------------------------------------------------------------------
#
# The pallas kernel wins on HBM bytes in isolation, but its custom call
# pins operand/result layouts: on hardware the round-2 profile showed XLA
# inserting ~2.9 ms/step of layout copies around the kernel boundary at the
# TIGER paper config (q·kᵀ outputs re-tiled before the call, p re-tiled
# after). This variant expresses the identical chain — fp32 upcast+scale,
# additive bias/key-padding, fp32 softmax, counter-hash dropout — as plain
# XLA ops inside the surrounding fusion, and gets the same "nothing hits
# HBM twice" property from a `custom_vjp` that *recomputes* the softmax
# from the saved bf16 raw scores instead of storing fp32 probabilities.
# The hash keep-mask is a handful of elementwise uint32 ops regenerated in
# the backward, so neither rng bits nor pred masks ever materialise.

def _hash_softmax_probs(s, bias, kpad, scale):
    sf = s.astype(jnp.float32) * scale
    sf = sf + bias[None] + kpad[:, None, None, :]
    return jax.nn.softmax(sf, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _hash_softmax(s, bias, kpad, seed, scale, rate):
    return _hash_softmax_fwd(s, bias, kpad, seed, scale, rate)[0]


def _hash_softmax_fwd(s, bias, kpad, seed, scale, rate):
    p = _hash_softmax_probs(s, bias, kpad, scale)
    if rate > 0.0:
        keep = hash_keep_mask(seed, jnp.uint32(0), p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    return p.astype(s.dtype), (s, bias, kpad, seed)


def _hash_softmax_bwd(scale, rate, res, g):
    s, bias, kpad, seed = res
    p = _hash_softmax_probs(s, bias, kpad, scale)
    g = g.astype(jnp.float32)
    if rate > 0.0:
        keep = hash_keep_mask(seed, jnp.uint32(0), p.shape, rate)
        g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
    ds = p * (g - jnp.sum(g * p, axis=-1, keepdims=True))
    dbias = jnp.sum(ds, axis=0)
    dseed = np.zeros((), jax.dtypes.float0)
    return (ds * scale).astype(s.dtype), dbias, jnp.zeros_like(kpad), dseed


_hash_softmax.defvjp(_hash_softmax_fwd, _hash_softmax_bwd)


def _attention_backend() -> str:
    """'pallas' | 'xla_hash': which fused-softmax implementation to use.

    Default is the pure-XLA hash variant (wins the hardware A/B once the
    custom-call layout copies are accounted for); ``GENREC_TPU_ATTN_PALLAS=1``
    selects the pallas kernel, and the interpreter tests always exercise
    the pallas body."""
    import os
    if INTERPRET or os.environ.get("GENREC_TPU_ATTN_PALLAS", "") \
            not in ("", "0"):
        return "pallas"
    return "xla_hash"


def fused_softmax_supported(platform: Optional[str] = None) -> bool:
    if _disabled("GENREC_TPU_NO_FUSED_ATTENTION"):
        return False
    if INTERPRET:
        return True
    return (platform or jax.default_backend()) == "tpu"


def fused_softmax(s, bias, kpad, seed, scale: float, rate: float = 0.0):
    """Public entry: ``dropout(softmax(s·scale + bias + kpad))`` fused.

    s: (B, H, Sq, Sk) raw scores (model dtype); bias: (H, Sq, Sk) fp32
    additive, batch-independent; kpad: (B, Sk) fp32 additive. Used
    directly by the decoder-only LLM path (llm.py), where the causal mask
    is batch-independent and padding decomposes per key."""
    impl = (_fused_softmax if _attention_backend() == "pallas"
            else _hash_softmax)
    return impl(s, bias.astype(jnp.float32), kpad.astype(jnp.float32),
                jnp.asarray(seed, jnp.int32), scale, rate)


# ---------------------------------------------------------------------------
# XLA fallback / oracle
# ---------------------------------------------------------------------------

def fused_attention_xla(q, k, v, bias, kpad, seed, rate: float,
                        n_heads: int):
    """Identical math via plain XLA (dropout uses the jax PRNG: the mask
    pattern differs from the TPU kernel but the distribution matches)."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    dh = HD // n_heads

    def split(x, s):
        return x.reshape(B, s, n_heads, dh)
    qh, kh, vh = split(q, Sq), split(k, Sk), split(v, Sk)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * (dh ** -0.5)
    s = s + bias[None] + kpad[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        keep = jax.random.bernoulli(key, 1.0 - rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(B, Sq, HD)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------

def fused_attention_supported(q_shape, n_heads: int,
                              platform: Optional[str] = None) -> bool:
    if _disabled("GENREC_TPU_NO_FUSED_ATTENTION"):
        return False
    if not INTERPRET:
        platform = platform or jax.default_backend()
        if platform != "tpu":
            return False
    B, S, HD = q_shape
    return HD % n_heads == 0 and S <= 2048


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray], kpad: Optional[jnp.ndarray],
                    *, n_heads: int, seed=0, dropout_rate: float = 0.0,
                    force_xla: bool = False) -> jnp.ndarray:
    """MHA with the fused softmax/mask/dropout kernel between XLA einsums.

    q: (B, Sq, H·Dh); k, v: (B, Sk, H·Dh) — head-interleaved layout, i.e.
    exactly the Dense-projection output. bias: (H, Sq, Sk) additive,
    batch-independent (relative-position bias and/or causal mask), or
    None. kpad: (B, Sk) additive float (0 / -1e9), or None. seed: int32
    scalar for attention dropout.
    """
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    dh = HD // n_heads
    if bias is None:
        bias = jnp.zeros((n_heads, Sq, Sk), jnp.float32)
    if kpad is None:
        kpad = jnp.zeros((B, Sk), jnp.float32)
    bias = bias.astype(jnp.float32)
    kpad = kpad.astype(jnp.float32)
    # microscopic score matrices (decoder self/cross at sem-id depth 3-4)
    # aren't worth a kernel launch — XLA's fusions handle them in-place
    if Sq * Sk < 1024:
        force_xla = True
    if force_xla or not fused_attention_supported(q.shape, n_heads):
        return fused_attention_xla(q, k, v, bias, kpad, seed,
                                   dropout_rate, n_heads)
    # Layout note: the head-interleaved "bqhd,bkhd->bhqk" einsums (implicit
    # batch-dim reordering) measured equal to explicit head-major
    # (B,H,S,Dh) transposes end-to-end at the TIGER paper config
    # (19.1-19.4k vs ~19.4k ex/s, v5e) — in the full step XLA lays the
    # Dense producers out for the dots either way. An isolated chain bench
    # said otherwise (scripts/attn_layout_bench.py: 7.7 vs 12.6 ms) but
    # that context lacks the producer matmuls; trust the step A/B.
    qh = q.reshape(B, Sq, n_heads, dh)
    kh = k.reshape(B, Sk, n_heads, dh)
    vh = v.reshape(B, Sk, n_heads, dh)
    s_raw = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)     # model dtype
    impl = (_fused_softmax if _attention_backend() == "pallas"
            else _hash_softmax)
    p = impl(s_raw, bias, kpad, jnp.asarray(seed, jnp.int32),
             dh ** -0.5, dropout_rate)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(B, Sq, HD)
