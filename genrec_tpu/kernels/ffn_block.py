"""Pallas TPU kernel: fused pre-norm FFN block (the transformer's second
half) — ``y = x + drop(Wo · drop(relu(Wi · rmsnorm(x, g))))``.

Unlike the full encoder megakernel (kernels/encoder_layer.py, which lost
to XLA at TIGER shapes because sample-packed attention multiplies the
score-matrix work), the FFN chain has no cross-sample structure: rows are
independent, so a block of rows is a perfect MXU workload with zero waste.
Under plain XLA the chain writes/reads ``n2 (N, D)``, ``h1 (N, F)`` and
the backward's saved residuals through HBM (~2/3 of a layer's activation
traffic at TIGER's F≈2.7D); here the only HBM traffic is x in, y out and
the resident weights, and the backward recomputes from x while
accumulating fp32 weight grads across the row-block grid.

Dropout keep-masks are the counter-hash (murmur3) masks shared with
``kernels.attention``; regenerated bitwise in the backward from
(seed, site, grid position) — nothing is stored.

Reference behavior: ``/root/reference/genrec/modules/transformer.py``
:162-189 (FeedForward: dense-relu-dropout-dense) and :318-323 (pre-norm
residual + dropout around it).

Hardware verdict (v5e, TIGER paper-config bench): 17.42k ex/s/chip with
the kernel vs 19.36k plain XLA — the custom-call boundary costs (layout
copies in/out of the kernel, and XLA losing the freedom to overlap the
FFN with neighbouring fusions) exceed the intermediate-traffic savings
at D=384/F=1024, the same dynamic that made the pure-XLA counter-hash
softmax beat the pallas one in round 2. Kept **opt-in**
(GENREC_TPU_FUSED_FFN=1): it is the building block to reach for at
larger D·F where the h1 tensor dominates a step's HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _disabled, _round_up
from .encoder_layer import _VMEM_LIMIT, _keep, _rmsnorm, _rmsnorm_bwd

INTERPRET = False   # tests flip this to run the kernel bodies on CPU

_ROWS = 512         # row-block size (N is padded up to a multiple)


def _fwd_kernel(seeds_ref, x_ref, g_ref, wi_ref, wo_ref, y_ref, *,
                rate: float):
    dt = x_ref.dtype
    R, F = x_ref.shape[0], wi_ref.shape[1]
    ib = pl.program_id(0)
    s2, s3 = seeds_ref[0], seeds_ref[1]

    x = x_ref[:]
    xf = x.astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    n, _, _ = _rmsnorm(xf, g, dt)
    h1f = jnp.dot(n, wi_ref[:], preferred_element_type=jnp.float32)
    # relu in fp32 (no bf16 vector compares on TPU); round∘max == max∘round
    h1 = _keep(s2, ib, (R, F), rate, jnp.maximum(h1f, 0.0).astype(dt))
    f = jnp.dot(h1, wo_ref[:], preferred_element_type=jnp.float32).astype(dt)
    f = _keep(s3, ib, x.shape, rate, f)
    y_ref[:] = x + f


def _bwd_kernel(seeds_ref, x_ref, g_ref, wi_ref, wo_ref, dy_ref,
                dx_ref, dg_ref, dwi_ref, dwo_ref, *, rate: float):
    dt = x_ref.dtype
    R, F = x_ref.shape[0], wi_ref.shape[1]
    ib = pl.program_id(0)
    s2, s3 = seeds_ref[0], seeds_ref[1]

    @pl.when(ib == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    # recompute forward up to h1
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    n, r, nb = _rmsnorm(xf, g, dt)
    h1f = jnp.dot(n, wi_ref[:], preferred_element_type=jnp.float32)
    h1 = _keep(s2, ib, (R, F), rate, jnp.maximum(h1f, 0.0).astype(dt))

    dy = dy_ref[:].astype(jnp.float32)
    df = _keep(s3, ib, x.shape, rate, dy)
    dfb = df.astype(dt)
    dwo_ref[:] += jax.lax.dot_general(
        h1, dfb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh1 = jax.lax.dot_general(dfb, wo_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = _keep(s2, ib, (R, F), rate, dh1)
    dh1 = jnp.where(h1f > 0, dh1, 0.0)
    dh1b = dh1.astype(dt)
    dwi_ref[:] += jax.lax.dot_general(
        n, dh1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dn = jax.lax.dot_general(dh1b, wi_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_n, dg = _rmsnorm_bwd(dn, g, xf, r, nb)
    dg_ref[:] += dg
    dx_ref[:] = (dy + dx_n).astype(dx_ref.dtype)


def _specs(R, D, F):
    return [
        pl.BlockSpec((R, D), lambda i, *_: (i, 0)),          # x
        pl.BlockSpec((1, D), lambda i, *_: (0, 0)),          # g
        pl.BlockSpec((D, F), lambda i, *_: (0, 0)),          # wi
        pl.BlockSpec((F, D), lambda i, *_: (0, 0)),          # wo
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ffn(x, g, wi, wo, seeds, rate):
    return _fused_ffn_fwd(x, g, wi, wo, seeds, rate)[0]


def _fused_ffn_fwd(x, g, wi, wo, seeds, rate):
    N, D = x.shape
    F = wi.shape[1]
    Np = _round_up(N, _ROWS)
    xp = jnp.pad(x, ((0, Np - N), (0, 0)))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // _ROWS,),
            in_specs=_specs(_ROWS, D, F),
            out_specs=pl.BlockSpec((_ROWS, D), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Np, D), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(seeds, xp, g.reshape(1, D), wi, wo)
    return y[:N], (x, g, wi, wo, seeds)


def _fused_ffn_bwd(rate, res, dy):
    x, g, wi, wo, seeds = res
    N, D = x.shape
    F = wi.shape[1]
    Np = _round_up(N, _ROWS)
    xp = jnp.pad(x, ((0, Np - N), (0, 0)))
    dyp = jnp.pad(dy.astype(x.dtype), ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // _ROWS,),
            in_specs=_specs(_ROWS, D, F) + [
                pl.BlockSpec((_ROWS, D), lambda i, *_: (i, 0)),   # dy
            ],
            out_specs=[
                pl.BlockSpec((_ROWS, D), lambda i, *_: (i, 0)),   # dx
                pl.BlockSpec((1, D), lambda i, *_: (0, 0)),       # dg
                pl.BlockSpec((D, F), lambda i, *_: (0, 0)),       # dwi
                pl.BlockSpec((F, D), lambda i, *_: (0, 0)),       # dwo
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Np, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(seeds, xp, g.reshape(1, D), wi, wo, dyp)
    dx, dg, dwi, dwo = out
    return (dx[:N], dg.reshape(g.shape).astype(g.dtype),
            dwi.astype(wi.dtype), dwo.astype(wo.dtype),
            np.zeros(seeds.shape, jax.dtypes.float0))


_fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def fused_ffn_supported(D: int, F: int) -> bool:
    """Opt-in via GENREC_TPU_FUSED_FFN=1 (TPU or interpreter only)."""
    import os
    if _disabled("GENREC_TPU_NO_FUSED_KERNELS"):
        return False
    if os.environ.get("GENREC_TPU_FUSED_FFN", "") in ("", "0") \
            and not INTERPRET:
        return False
    if not INTERPRET and jax.default_backend() != "tpu":
        return False
    return D % 128 == 0 and F % 128 == 0


def fused_ffn_block(x, *, g, wi, wo, seeds=None, dropout_rate: float = 0.0):
    """``x + drop(wo · drop(relu(wi · rmsnorm(x, g))))`` in one kernel.

    x: (..., D) model-dtype activations (leading dims are flattened to
    rows). g: (D,) norm scale; wi (D, F), wo (F, D) Dense-layout kernels;
    seeds: (2,) int32 dropout seeds (ffn-hidden, ffn-out).
    """
    lead = x.shape[:-1]
    D = x.shape[-1]
    if seeds is None:
        seeds = jnp.zeros((2,), jnp.int32)
    y = _fused_ffn(x.reshape(-1, D), g, wi.astype(x.dtype),
                   wo.astype(x.dtype), jnp.asarray(seeds, jnp.int32),
                   float(dropout_rate))
    return y.reshape(*lead, D)
