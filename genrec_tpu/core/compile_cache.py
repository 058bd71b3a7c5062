"""Persistent XLA compilation cache.

On the axon TPU path every new program shape goes through the remote
compile service — 5–40 minutes for large models — and that cost repays on
every process restart. JAX's persistent cache keys compiled executables by
HLO hash and reloads them from disk, so a re-run (resume, bench repeat,
eval-only) of an already-seen program skips compilation entirely.

Enabled by default on non-CPU backends; override with
``GENREC_TPU_COMPILE_CACHE=<dir>`` (or ``0`` to disable). CPU stays off so
tests don't litter cache directories for sub-second compiles.
"""

from __future__ import annotations

import os

import jax

_CONFIGURED = False


def configure_compile_cache(path: str = "out/.jax_cache") -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    env = os.environ.get("GENREC_TPU_COMPILE_CACHE")
    if env == "0":
        return
    if env:
        path = env
    else:
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:
            return
    _CONFIGURED = True
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    # cache anything that took ≥ 2s to compile, regardless of size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
