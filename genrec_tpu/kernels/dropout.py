"""Pallas TPU kernel: fused dropout with regenerate-in-backward masks.

XLA lowers ``jax.random.bernoulli``-based dropout to a uint32
rng-bit-generator tensor plus a pred mask, both materialised in HBM and the
pred re-read by the backward pass — ~13 bytes of traffic per element per
direction. At the TIGER paper config the FFN-hidden and residual dropout
sites account for multiple GB/step (round-2 profile). This kernel derives
the keep-mask from a counter-based hash (murmur3 finalizer over the global
element index — see ``kernels.attention.hash_keep_mask``) and applies it in
one pass (read x, write y: 2·itemsize per element); the custom VJP
regenerates the identical mask from the same seed, so no mask tensor ever
exists in HBM. Counter-based beats the stateful ``pltpu.prng_*`` stream
here because the latter is not reproducible across different kernels
(measured on hardware) — and the hash also runs under the CPU interpreter,
so the dropout arithmetic is unit-testable off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (memory spaces)

from .attention import hash_keep_mask

INTERPRET = False   # tests flip this to run the kernel on CPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mask_kernel(seed_ref, x_ref, y_ref, *, rate: float):
    seed = seed_ref[0]
    # element counter = (pid·bn + row)·d + col — the global position, so the
    # mask is independent of the block decomposition
    draw = jnp.uint32(pl.program_id(0))
    keep = hash_keep_mask(seed, draw, x_ref.shape, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x_ref.dtype)
    y_ref[:] = jnp.where(keep, x_ref[:] * scale, 0)


def _run(x2d, seed, rate):
    n, d = x2d.shape
    # ~0.5 MB blocks: enough rows to amortise grid overhead, small in VMEM;
    # never pad beyond the input's own 8-row round-up
    bn = max(8, ((1 << 18) // max(d, 1)) // 8 * 8)
    bn = min(bn, _round_up(n, 8))
    np_ = _round_up(n, bn)
    xp = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // bn,),
            in_specs=[pl.BlockSpec((bn, d), lambda i, *_: (i, 0))],
            out_specs=pl.BlockSpec((bn, d), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((np_, d), x2d.dtype),
        interpret=INTERPRET,
    )(jnp.asarray([seed], jnp.int32).reshape(1), xp)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_dropout(x, seed, rate):
    return _fused_dropout_fwd(x, seed, rate)[0]


def _fused_dropout_fwd(x, seed, rate):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    y = _run(x2d, seed, rate).reshape(shape)
    return y, (seed,)


def _fused_dropout_bwd(rate, res, g):
    (seed,) = res
    shape = g.shape
    g2d = g.reshape(-1, shape[-1])
    dx = _run(g2d, seed, rate).reshape(shape)
    return dx, np.zeros((), jax.dtypes.float0)


_fused_dropout.defvjp(_fused_dropout_fwd, _fused_dropout_bwd)


# ---------------------------------------------------------------------------
# pure-XLA variant: the default dropout backend
# ---------------------------------------------------------------------------
#
# Hardware A/B (round 2) showed the *standalone pallas* dropout kernel is a
# net loss at FFN/residual sites: XLA fuses plain dropout's mask application
# into the producing/consuming fusions, and a custom call in the middle
# splits them. But plain ``jax.random.bernoulli`` dropout still pays for a
# uint32 rng-bit tensor per site plus a pred mask saved for (and re-read by)
# the backward — ~1.2 ms/step of pure traffic at the TIGER paper config.
# This variant gets both properties at once: the counter-hash keep-mask is
# a handful of elementwise uint32 ops that *join* the producer/consumer
# fusion (no custom call, no rng tensor), and the custom VJP regenerates
# the mask in the backward so no pred is ever stored. Pure XLA, so it runs
# identically on TPU and CPU.

def _hash_apply(x, seed, rate):
    keep = hash_keep_mask(seed, jnp.uint32(0), x.shape, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_dropout(x, seed, rate):
    return _hash_dropout_fwd(x, seed, rate)[0]


def _hash_dropout_fwd(x, seed, rate):
    return _hash_apply(x, seed, rate), (seed,)


def _hash_dropout_bwd(rate, res, g):
    (seed,) = res
    return _hash_apply(g, seed, rate), np.zeros((), jax.dtypes.float0)


_hash_dropout.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)


def hash_dropout(x: jnp.ndarray, seed, rate: float) -> jnp.ndarray:
    """``x * bernoulli(1-rate) / (1-rate)`` as fusable XLA elementwise ops:
    no rng-bit tensor, no stored mask (regenerated in the backward)."""
    if rate <= 0.0:
        return x
    return _hash_dropout(x, jnp.asarray(seed, jnp.int32), rate)


def fused_dropout_supported(platform=None) -> bool:
    from .attention import _disabled
    if _disabled("GENREC_TPU_NO_FUSED_DROPOUT"):
        return False
    if INTERPRET:
        return True
    return (platform or jax.default_backend()) == "tpu"


def fused_dropout(x: jnp.ndarray, seed, rate: float) -> jnp.ndarray:
    """``x * bernoulli(1-rate) / (1-rate)`` with no HBM mask tensor."""
    if rate <= 0.0:
        return x
    if not fused_dropout_supported():
        key = jax.random.fold_in(jax.random.PRNGKey(0),
                                 jnp.asarray(seed, jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0)
    return _fused_dropout(x, jnp.asarray(seed, jnp.int32), rate)
