"""PRNG configuration.

History: profiling round 1 showed threefry dropout-MASK generation
dominating the TIGER train step (xor/bitcast chains over full activation
tensors); switching to the TPU hardware RNG (``unsafe_rbg``) cut step time
23 ms → 15.8 ms. Round 2 replaced mask generation entirely with
counter-hash dropout (murmur3 keep-masks, ``kernels/dropout.py``), after
which the only per-step ``jax.random`` work is ~40 SCALAR seed draws — so
the rbg switch no longer bought throughput (r5 measured: HSTU parity
seeds 66 s/seed under either impl).

Round 5 finding: it did cost quality. ``unsafe_rbg``'s ``split``/
``fold_in`` key derivation is deliberately weak; deriving the per-site
31-bit hash-dropout seeds through it measurably degraded HSTU R@10 in the
head-to-head (hash masks + rbg keys 0.1250 vs + threefry keys 0.1273 at
n=15/side, two independent A/Bs agreeing within 1e-4 — rows tagged
``genrec_tpu_threefry`` / ``genrec_tpu_plaindrop`` in
``out/parity/hstu_runs.jsonl``). Threefry key derivation is therefore the
default again; ``GENREC_TPU_UNSAFE_RBG=1`` restores the hardware-RNG
stream for A/B archaeology.
"""

from __future__ import annotations

import os

import jax


def configure_fast_rng(enable: bool = True) -> None:
    """Install the persistent compilation cache and (optionally) the
    legacy hardware-RNG stream.

    Every CLI entry point (trainers, bench, scripts) funnels through this
    call. ``enable`` is kept for the ``train.fast_rng`` knob's backward
    compatibility; since r5 it does NOT switch the PRNG impl — threefry
    key derivation is quality-relevant (see module docstring) and costs
    nothing now that dropout masks are counter-hash.
    """
    from .compile_cache import configure_compile_cache
    configure_compile_cache()
    if os.environ.get("GENREC_TPU_UNSAFE_RBG", "") in ("", "0"):
        return
    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    except Exception:
        pass


def seed_from_rng(key, shape=()):
    """Cheap high-quality int32 seed(s) from a PRNG key, without a
    ``random_bits`` kernel.

    The key handed out by ``make_rng``/``fold_in`` is already a
    threefry-mixed 64-bit value; XOR-folding its words gives uniform
    31-bit seeds for the counter-hash dropout/softmax kernels at zero
    compute (r5: the per-site ``jax.random.randint`` draws cost TIGER
    ~4% step time once threefry key derivation came back). For a
    non-scalar ``shape``, distinct seeds derive from the single key by
    counter-murmur of the lane index (same mixer as the mask kernels).
    """
    import jax.numpy as jnp
    from jax import random
    kd = random.key_data(key).astype(jnp.uint32).reshape(-1)
    base = kd[-1] ^ kd[-2] if kd.shape[0] >= 2 else kd[-1]
    n = 1
    for d in shape:
        n *= d
    if shape == ():
        return jnp.asarray(base & jnp.uint32(0x7FFFFFFF), jnp.int32)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    h = base[None] ^ (lanes * jnp.uint32(0x9E3779B9))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32).reshape(shape)
