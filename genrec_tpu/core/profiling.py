"""Profiling hooks (the reference has none — SURVEY.md §5 'tracing: absent').

TPU-era tracing: ``jax.profiler`` trace capture around a step window, plus a
simple ``block_until_ready`` step timer. Enable from any trainer with
``--gin "train.profile_dir='/tmp/trace'"`` style knobs or use directly.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax

from genrec_tpu.configlib import gin


@gin.configurable
@contextlib.contextmanager
def profile_trace(profile_dir: Optional[str] = None,
                  create_perfetto_link: bool = False):
    """Context manager capturing a jax.profiler trace when enabled."""
    if not profile_dir:
        yield
        return
    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir,
                            create_perfetto_link=create_perfetto_link):
        yield


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None):
    """Wall-clock a device-synchronised region."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
