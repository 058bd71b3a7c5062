"""PRNG configuration.

Profiling round 1 (STATUS.md) showed threefry dropout-mask generation
dominating the TIGER train step on TPU: the largest fusions in the profile
were xor/bitcast chains over full activation tensors, and switching to the
TPU hardware RNG cut step time 23 ms → 15.8 ms (+46% throughput). JAX's
``unsafe_rbg`` impl is deterministic per key and fold/split-compatible; its
streams differ from threefry (quality fine for dropout, not for
cryptography), so it is opt-out via ``train.fast_rng=False``.
"""

from __future__ import annotations

import jax


def configure_fast_rng(enable: bool = True) -> None:
    """Use the TPU hardware RNG for jax.random (call before creating keys).

    Every CLI entry point (trainers, bench, scripts) funnels through this
    call, so it also installs the persistent compilation cache — see
    :mod:`genrec_tpu.core.compile_cache`.
    """
    from .compile_cache import configure_compile_cache
    configure_compile_cache()
    if not enable:
        return
    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    except Exception:
        pass
