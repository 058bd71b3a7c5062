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


def aggregate_device_ops(trace_dir: str, steps: int = 1,
                         top: int = 40) -> list:
    """Parse a jax.profiler trace dir and aggregate device-side op times.

    Returns [(name, ms_per_step, count_per_step)] sorted by time, and
    prints a table. ``steps`` is the number of identical steps captured
    inside the trace window.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print(f"no trace files under {trace_dir}")
        return []
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    pid_name = {e["pid"]: e.get("args", {}).get("name", "")
                for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_name.items() if "TPU" in n or "Axon" in n}
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"total device time {total/1e3:.1f} ms over {steps} steps "
          f"=> {total/1e3/steps:.2f} ms/step device-side")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    out = []
    for name, dur in rows[:top]:
        print(f"{dur/steps/1e3:9.3f} ms/step  x{cnt[name]//steps:<4d}"
              f" {name[:110]}")
        out.append((name, dur / steps / 1e3, cnt[name] // steps))
    return out


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None):
    """Wall-clock a device-synchronised region."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
