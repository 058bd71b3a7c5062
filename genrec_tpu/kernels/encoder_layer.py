"""Pallas TPU megakernel: one full pre-norm transformer encoder layer.

Motivation (round-2b profile of the TIGER paper-config step, v5e): with the
layer expressed as ~40 XLA fusions, 38% of device time is layout copies of
the (B, S, D) residual stream and the (B, H, S, S)/(B, S, H, Dh) attention
tensors bouncing through HBM between fusions, and most of the rest is
HBM traffic for intermediates. This kernel computes

    n1  = rmsnorm(x, g1)
    qkv = n1 @ Wqkv                                  # fused [q|k|v] columns
    s_h = (q_h k_hᵀ)·scale + rel_bias_h + kpad       # per head
    p_h = drop(softmax_fp32(s_h))
    o   = Σ_h (p_h v_h) @ Wo[h]                      # no head-concat tensor
    x2  = x + drop(o)
    y   = x2 + drop(Wo2 · drop(relu(Wi · rmsnorm(x2, g2))))

for a block of ``bs`` samples entirely in VMEM: per layer the only HBM
traffic is x in, y out, and the (resident) weights. The backward kernel
recomputes everything from x (flash-attention-style) and accumulates the
weight gradients in fp32 VMEM scratch across the sequential batch grid,
so no intermediate ever materialises in either direction.

Attention is *sample-packed*: the ``bs`` samples' sequences are stacked
into one (N, N) = (bs·Sp, bs·Sp) score matrix per head so the MXU sees one
large matmul instead of ``bs`` tiny (S, Dh) ones (the round-2 per-sample
kernel was 10× slower than XLA for exactly that reason). Cross-sample
cells are masked to -1e9 with an iota comparison; the extra FLOPs are
~bs× on the attention dots, which is noise next to the projection/FFN
dots at S≈61, Dh=64.

Dropout keep-masks are the counter-hash (murmur3) masks shared with
``kernels.attention`` / ``kernels.dropout``: regenerated bitwise in the
backward from (seed, site, grid position), so no mask is ever stored.

Reference behavior: ``/root/reference/genrec/modules/transformer.py``
:256-324 (pre-norm block), :106-159 (T5 attention with relative bias).

Semantics deviation (documented): XLA's unfused path rounds the raw
attention scores to bf16 between the q·kᵀ einsum and the softmax; this
kernel keeps them fp32. Differences are below bf16 resolution.

Hardware verdict (v5e, TIGER paper shapes B=256 S=61 D=384 H=6 F=1024,
queued-dispatch timing): fwd+bwd 3.51 ms/layer vs 2.98 ms for the plain
XLA composition — the kernel sustains higher raw FLOP/s (~48 vs ~29
TFLOP/s) but burns it on cross-sample attention waste (bs=4 packing
quadruples the score-matrix work; bs=2 measured slower still, 3.83 ms,
as the matmuls drop below MXU-efficient tiles) and on the
flash-attention-style double recompute in the backward. Dropout hashing
is noise (+0.06 ms). At S≈61 the residual-stream HBM savings cannot
repay that; XLA's batched (B·H) einsums are the right tool. Kept
**opt-in** (GENREC_TPU_FUSED_LAYER=1) as the validated template for
long-sequence layers (S≥256, bs=1) where packing waste vanishes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF, _disabled, _round_up, hash_keep_mask

INTERPRET = False   # tests flip this to run the kernel bodies on CPU


# ---------------------------------------------------------------------------
# shared in-kernel pieces
# ---------------------------------------------------------------------------

def _rmsnorm(xf, g, dt, eps=1e-6):
    """fp32 RMS norm matching nn.normalize.RMSNorm: the normalised value is
    rounded to the model dtype *before* the scale multiply. Returns
    (normed_scaled model-dtype, rsqrt (N,1) fp32, normed_rounded fp32)."""
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    nb = (xf * r).astype(dt).astype(jnp.float32)
    n = (nb * g).astype(dt)
    return n, r, nb


def _rmsnorm_bwd(dn, g, xf, r, nb):
    """Backward of _rmsnorm (rounding treated as identity).
    Returns (dx fp32, dg fp32 (1, D))."""
    dg = jnp.sum(nb * dn, axis=0, keepdims=True)
    dnb = dn * g
    d = xf.shape[-1]
    dot = jnp.sum(xf * dnb, axis=-1, keepdims=True)
    dx = r * dnb - xf * (r * r * r / d) * dot
    return dx, dg


def _keep(seed, draw, shape, rate, x):
    """Apply the counter-hash dropout mask (identical fwd/bwd)."""
    if rate <= 0.0:
        return x
    keep = hash_keep_mask(seed, jnp.uint32(draw), shape, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def _mask_matrix(kpad_row, N, Sp):
    """(N, N) fp32 additive mask: cross-sample cells -1e9 plus per-key
    padding. kpad_row is the host-flattened (1, N) additive padding for
    this block's packed keys (Mosaic cannot reshape (bs, Sp) -> (N,)
    across the lane dimension in-kernel, so the flatten happens host-side
    in _pad_inputs)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    same_neg = jnp.where((rows // Sp) == (cols // Sp), 0.0, NEG_INF)
    return same_neg + kpad_row


def _attn_probs(qkv, bias_ref, mask, h, D, Dh, Sp, scale,
                seed0, draw0, rate):
    """(N, N) fp32 pre-dropout probs + model-dtype dropped probs, head h."""
    N = qkv.shape[0]
    dt = qkv.dtype
    qh = qkv[:, h * Dh:(h + 1) * Dh]
    kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
    s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # rel-bias expand: bias_h at (q mod Sp, k mod Sp); off-diagonal blocks
    # are dead (-1e9) so adding the tiled bias everywhere is harmless.
    # P (N, Sp) one-hot of (row mod Sp): expanded = P @ bias_h @ Pᵀ.
    row = jax.lax.broadcasted_iota(jnp.int32, (N, Sp), 0) % Sp
    col = jax.lax.broadcasted_iota(jnp.int32, (N, Sp), 1)
    P = (row == col).astype(jnp.float32)
    bP = jax.lax.dot_general(bias_ref[h], P, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Sp, N)
    s = s + jnp.dot(P, bP, preferred_element_type=jnp.float32)
    s = s + mask
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pd = _keep(seed0, draw0 + h, p.shape, rate, p).astype(dt)
    return p, pd, P


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seeds_ref, x_ref, wqkv_ref, wo_ref, g1_ref, g2_ref,
                wi_ref, wo2_ref, bias_ref, kpad_ref, y_ref, *,
                n_heads: int, rate: float):
    bs, Sp, D = x_ref.shape
    dt = x_ref.dtype
    N = bs * Sp
    Dh = D // n_heads
    F = wi_ref.shape[1]
    scale = Dh ** -0.5
    ib = pl.program_id(0)
    s0, s1, s2, s3 = (seeds_ref[0], seeds_ref[1], seeds_ref[2], seeds_ref[3])

    x = x_ref[:].reshape(N, D)
    xf = x.astype(jnp.float32)
    g1 = g1_ref[:].astype(jnp.float32)
    n1, _, _ = _rmsnorm(xf, g1, dt)
    qkv = jnp.dot(n1, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(dt)

    mask = _mask_matrix(kpad_ref[:][0, 0:1, :], N, Sp)

    o_acc = jnp.zeros((N, D), jnp.float32)
    for h in range(n_heads):
        _, pd, _ = _attn_probs(qkv, bias_ref, mask, h, D, Dh, Sp,
                               scale, s0, ib * n_heads, rate)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        att = jnp.dot(pd, vh,
                      preferred_element_type=jnp.float32).astype(dt)
        o_acc = o_acc + jnp.dot(att, wo_ref[h * Dh:(h + 1) * Dh, :],
                                preferred_element_type=jnp.float32)
    o = _keep(s1, ib, (N, D), rate, o_acc.astype(dt))
    x2 = x + o

    g2 = g2_ref[:].astype(jnp.float32)
    n2, _, _ = _rmsnorm(x2.astype(jnp.float32), g2, dt)
    h1f = jnp.dot(n2, wi_ref[:], preferred_element_type=jnp.float32)
    # relu in fp32 (Mosaic lacks bf16 vector compares); rounding preserves
    # sign, so max∘round == round∘max exactly
    h1 = jnp.maximum(h1f, 0.0).astype(dt)
    h1 = _keep(s2, ib, (N, F), rate, h1)
    f = jnp.dot(h1, wo2_ref[:],
                preferred_element_type=jnp.float32).astype(dt)
    f = _keep(s3, ib, (N, D), rate, f)
    y_ref[:] = (x2 + f).reshape(bs, Sp, D)


# ---------------------------------------------------------------------------
# backward kernel (recompute + accumulate weight grads over the batch grid)
# ---------------------------------------------------------------------------

def _bwd_kernel(seeds_ref, x_ref, wqkv_ref, wo_ref, g1_ref, g2_ref,
                wi_ref, wo2_ref, bias_ref, kpad_ref, dy_ref,
                dx_ref, dwqkv_ref, dwo_ref, dg1_ref, dg2_ref,
                dwi_ref, dwo2_ref, dbias_ref, dqkv_scr, *,
                n_heads: int, rate: float):
    bs, Sp, D = x_ref.shape
    dt = x_ref.dtype
    N = bs * Sp
    Dh = D // n_heads
    F = wi_ref.shape[1]
    scale = Dh ** -0.5
    ib = pl.program_id(0)
    s0, s1, s2, s3 = (seeds_ref[0], seeds_ref[1], seeds_ref[2], seeds_ref[3])

    @pl.when(ib == 0)
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwo2_ref[:] = jnp.zeros_like(dwo2_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    # ---- recompute forward up to x2 ----
    x = x_ref[:].reshape(N, D)
    xf = x.astype(jnp.float32)
    g1 = g1_ref[:].astype(jnp.float32)
    n1, r1, nb1 = _rmsnorm(xf, g1, dt)
    qkv = jnp.dot(n1, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(dt)

    mask = _mask_matrix(kpad_ref[:][0, 0:1, :], N, Sp)

    o_acc = jnp.zeros((N, D), jnp.float32)
    for h in range(n_heads):
        _, pd, _ = _attn_probs(qkv, bias_ref, mask, h, D, Dh, Sp,
                               scale, s0, ib * n_heads, rate)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        att = jnp.dot(pd, vh,
                      preferred_element_type=jnp.float32).astype(dt)
        o_acc = o_acc + jnp.dot(att, wo_ref[h * Dh:(h + 1) * Dh, :],
                                preferred_element_type=jnp.float32)
    o = _keep(s1, ib, (N, D), rate, o_acc.astype(dt))
    x2 = x + o
    x2f = x2.astype(jnp.float32)
    g2 = g2_ref[:].astype(jnp.float32)
    n2, r2, nb2 = _rmsnorm(x2f, g2, dt)
    h1f = jnp.dot(n2, wi_ref[:], preferred_element_type=jnp.float32)
    h1 = _keep(s2, ib, (N, F), rate, jnp.maximum(h1f, 0.0).astype(dt))

    # ---- backward ----
    dy = dy_ref[:].reshape(N, D).astype(jnp.float32)
    # y = x2 + drop3(f)
    df = _keep(s3, ib, (N, D), rate, dy)
    dfb = df.astype(dt)
    dwo2_ref[:] += jax.lax.dot_general(
        h1, dfb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh1 = jax.lax.dot_general(dfb, wo2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = _keep(s2, ib, (N, F), rate, dh1)
    dh1 = jnp.where(h1f > 0, dh1, 0.0)
    dh1b = dh1.astype(dt)
    dwi_ref[:] += jax.lax.dot_general(
        n2, dh1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dn2 = jax.lax.dot_general(dh1b, wi_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx2_n, dg2 = _rmsnorm_bwd(dn2, g2, x2f, r2, nb2)
    dg2_ref[:] += dg2
    dx2 = dy + dx2_n                                   # y and norm2 paths

    # x2 = x + drop1(o); o = Σ_h att_h @ Wo[h]
    do = _keep(s1, ib, (N, D), rate, dx2).astype(dt)
    dqkv_scr[:] = jnp.zeros_like(dqkv_scr)
    for h in range(n_heads):
        p, pd, P = _attn_probs(qkv, bias_ref, mask, h, D, Dh, Sp,
                               scale, s0, ib * n_heads, rate)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        att = jnp.dot(pd, vh,
                      preferred_element_type=jnp.float32).astype(dt)
        wo_h = wo_ref[h * Dh:(h + 1) * Dh, :]
        dwo_ref[h * Dh:(h + 1) * Dh, :] += jax.lax.dot_general(
            att, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        datt = jax.lax.dot_general(do, wo_h, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dattb = datt.astype(dt)
        dvh = jax.lax.dot_general(pd, dattb, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dattb, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = _keep(s0, ib * n_heads + h, (N, N), rate, dp)
        ds = p * (g - jnp.sum(g * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.dot(
            jax.lax.dot_general(P, ds, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            P, preferred_element_type=jnp.float32)
        dsb = (ds * scale).astype(dt)
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        dqkv_scr[:, h * Dh:(h + 1) * Dh] = jnp.dot(
            dsb, kh, preferred_element_type=jnp.float32)
        dqkv_scr[:, D + h * Dh:D + (h + 1) * Dh] = jax.lax.dot_general(
            dsb, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkv_scr[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh] = dvh

    dqkv = dqkv_scr[:].astype(dt)
    dwqkv_ref[:] += jax.lax.dot_general(
        n1, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dn1 = jax.lax.dot_general(dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_n, dg1 = _rmsnorm_bwd(dn1, g1, xf, r1, nb1)
    dg1_ref[:] += dg1
    dx = dx2 + dx_n
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(bs, Sp, D)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

# scoped-VMEM ceiling for the kernels (v5e has 128 MiB; the default 16 MiB
# scoped limit rejects the backward's live set at N=256)
_VMEM_LIMIT = 100 * 1024 * 1024


def _plan(B: int, S: int) -> tuple:
    """Pack samples so the packed score matrix is ~(256, 256): larger packs
    waste attention FLOPs quadratically (cross-sample cells are masked) and
    blow past scoped VMEM in the backward; smaller ones under-feed the MXU."""
    Sp = _round_up(S, 8)
    bs = max(1, 256 // Sp)
    while B % bs and bs > 1:      # avoid padding whole samples when possible
        bs //= 2
    return bs, Sp, _round_up(B, bs)


def _pad_inputs(x, kpad, bias, bs, Sp, Bp):
    B, S, D = x.shape
    N = bs * Sp
    xp = jnp.pad(x, ((0, Bp - B), (0, Sp - S), (0, 0)))
    kpadp = jnp.pad(kpad, ((0, Bp - B), (0, Sp - S)),
                    constant_values=NEG_INF)
    # flatten to the packed-key axis per grid block, tiled to 8 sublanes to
    # satisfy the TPU block-shape rule (the kernel reads row 0 only)
    kpadr = jnp.broadcast_to(kpadp.reshape(Bp // bs, 1, N),
                             (Bp // bs, 8, N))
    biasp = jnp.pad(bias, ((0, 0), (0, Sp - S), (0, Sp - S)))
    return xp, kpadr, biasp


def _specs(bs, Sp, D, F, H):
    """(in_specs, weight shapes) shared by fwd and bwd."""
    return [
        pl.BlockSpec((bs, Sp, D), lambda i, *_: (i, 0, 0)),       # x
        pl.BlockSpec((D, 3 * D), lambda i, *_: (0, 0)),           # wqkv
        pl.BlockSpec((D, D), lambda i, *_: (0, 0)),               # wo
        pl.BlockSpec((1, D), lambda i, *_: (0, 0)),               # g1
        pl.BlockSpec((1, D), lambda i, *_: (0, 0)),               # g2
        pl.BlockSpec((D, F), lambda i, *_: (0, 0)),               # wi
        pl.BlockSpec((F, D), lambda i, *_: (0, 0)),               # wo2
        pl.BlockSpec((H, Sp, Sp), lambda i, *_: (0, 0, 0)),       # bias
        pl.BlockSpec((1, 8, bs * Sp), lambda i, *_: (i, 0, 0)),   # kpad row
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _fused_layer(x, wqkv, wo, g1, g2, wi, wo2, bias, kpad, seeds, rate,
                 n_heads):
    return _fused_layer_fwd(x, wqkv, wo, g1, g2, wi, wo2, bias, kpad,
                            seeds, rate, n_heads)[0]


def _fused_layer_fwd(x, wqkv, wo, g1, g2, wi, wo2, bias, kpad, seeds, rate,
                     n_heads):
    B, S, D = x.shape
    F = wi.shape[1]
    bs, Sp, Bp = _plan(B, S)
    xp, kpadp, biasp = _pad_inputs(x, kpad, bias, bs, Sp, Bp)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // bs,),
            in_specs=_specs(bs, Sp, D, F, n_heads),
            out_specs=pl.BlockSpec((bs, Sp, D), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(seeds, xp, wqkv, wo, g1.reshape(1, D), g2.reshape(1, D), wi, wo2,
      biasp, kpadp)
    return y[:B, :S], (x, wqkv, wo, g1, g2, wi, wo2, bias, kpad, seeds)


def _fused_layer_bwd(rate, n_heads, res, dy):
    x, wqkv, wo, g1, g2, wi, wo2, bias, kpad, seeds = res
    B, S, D = x.shape
    F = wi.shape[1]
    H = n_heads
    bs, Sp, Bp = _plan(B, S)
    xp, kpadp, biasp = _pad_inputs(x, kpad, bias, bs, Sp, Bp)
    dyp = jnp.pad(dy.astype(x.dtype),
                  ((0, Bp - B), (0, Sp - S), (0, 0)))
    in_specs = _specs(bs, Sp, D, F, H) + [
        pl.BlockSpec((bs, Sp, D), lambda i, *_: (i, 0, 0)),       # dy
    ]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // bs,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bs, Sp, D), lambda i, *_: (i, 0, 0)),   # dx
                pl.BlockSpec((D, 3 * D), lambda i, *_: (0, 0)),
                pl.BlockSpec((D, D), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, D), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, D), lambda i, *_: (0, 0)),
                pl.BlockSpec((D, F), lambda i, *_: (0, 0)),
                pl.BlockSpec((F, D), lambda i, *_: (0, 0)),
                pl.BlockSpec((H, Sp, Sp), lambda i, *_: (0, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((bs * Sp, 3 * D), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Sp, D), x.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((H, Sp, Sp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(seeds, xp, wqkv, wo, g1.reshape(1, D), g2.reshape(1, D), wi, wo2,
      biasp, kpadp, dyp)
    dx, dwqkv, dwo, dg1, dg2, dwi, dwo2, dbias = out
    return (dx[:B, :S], dwqkv.astype(wqkv.dtype), dwo.astype(wo.dtype),
            dg1.reshape(g1.shape).astype(g1.dtype),
            dg2.reshape(g2.shape).astype(g2.dtype),
            dwi.astype(wi.dtype), dwo2.astype(wo2.dtype),
            dbias[:, :S, :S].astype(bias.dtype), jnp.zeros_like(kpad),
            np.zeros(seeds.shape, jax.dtypes.float0))


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_encoder_layer_supported(S: int, D: int, n_heads: int,
                                  platform: Optional[str] = None) -> bool:
    """Opt-in via GENREC_TPU_FUSED_LAYER=1 (TPU or interpreter only)."""
    import os
    if _disabled("GENREC_TPU_NO_FUSED_KERNELS"):
        return False
    if os.environ.get("GENREC_TPU_FUSED_LAYER", "") in ("", "0") \
            and not INTERPRET:
        return False
    if not INTERPRET:
        if (platform or jax.default_backend()) != "tpu":
            return False
    if D % n_heads or (D // n_heads) % 8 or D % 128:
        return False
    return S <= 512


def fused_encoder_layer(x, *, wq, wkv, wo, g1, g2, wi, wo2, bias, kpad,
                        n_heads: int, seeds=None,
                        dropout_rate: float = 0.0):
    """One pre-norm self-attention + FFN encoder layer, fully fused.

    x: (B, S, D) model-dtype activations. wq (D, D), wkv (D, 2D) packed
    [k|v] as in T5Attention, wo (D, D), wi (D, F), wo2 (F, D): bf16/fp32
    kernels (Dense layout: in-features first). g1/g2: (D,) norm scales.
    bias: (H, S, S) fp32 additive (relative-position bias), or None.
    kpad: (B, S) additive fp32 (0 valid / -1e9 pad), or None.
    seeds: (4,) int32 dropout seeds (probs, attn-out, ffn-hidden, ffn-out).
    """
    B, S, D = x.shape
    if bias is None:
        bias = jnp.zeros((n_heads, S, S), jnp.float32)
    if kpad is None:
        kpad = jnp.zeros((B, S), jnp.float32)
    if seeds is None:
        seeds = jnp.zeros((4,), jnp.int32)
    wqkv = jnp.concatenate([wq, wkv], axis=1).astype(x.dtype)
    return _fused_layer(x, wqkv, wo.astype(x.dtype), g1, g2,
                        wi.astype(x.dtype), wo2.astype(x.dtype),
                        bias.astype(jnp.float32), kpad.astype(jnp.float32),
                        jnp.asarray(seeds, jnp.int32), float(dropout_rate),
                        n_heads)
