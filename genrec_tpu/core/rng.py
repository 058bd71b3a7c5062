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
