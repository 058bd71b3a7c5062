"""bench.py measurement-protocol helpers (roofline + median-of-windows)."""

import json
import os
import subprocess
import sys

import numpy as np


def test_timed_windows_median_protocol():
    sys.path.insert(0, "/root/repo")
    from bench import timed_windows

    calls = []
    eps = timed_windows(lambda n: calls.append(n), lambda: None,
                        batch_elems=32, steps=4, repeats=3)
    assert calls == [4, 4, 4]
    assert len(eps) == 3 and all(e > 0 for e in eps)


def test_xla_cost_reports_flops():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import xla_cost

    @jax.jit
    def f(x):
        return (x @ x).sum()

    cost = xla_cost(f, jnp.ones((128, 128)))
    # 2 * 128^3 matmul flops plus the reduce
    assert cost["flops"] and cost["flops"] >= 2 * 128 ** 3
    assert cost["bytes"] and cost["bytes"] >= 128 * 128 * 4


def test_bench_smoke_emits_roofline_fields(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--smoke", "--model", "sasrec",
         "--steps", "2", "--repeats", "2"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][0]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "spread_pct"):
        assert key in rec, rec
    assert rec["value"] > 0
    # protocol record appended with per-window detail (CPU runs are
    # diverted to the sibling file so TPU evidence stays clean)
    with open("/root/repo/out/cpu_measurements.jsonl") as f:
        last = json.loads(f.readlines()[-1])
    assert last["metric"] == rec["metric"]
    assert len(last["windows_eps"]) == 2
    # r4 roofline split: analytic min-traffic lower bound (feeds
    # hbm_bw_pct) + XLA bytes-accessed kept as the labeled upper bound
    assert last["flops_per_step"] and last["hbm_bytes_min_per_step"]
    assert last["hbm_bytes_xla_upper_per_step"]
    assert np.isfinite(last["final_loss"])


def test_trainer_fuse_defaults_match_bench():
    """The measured-optimal fuse factors (bench.FUSE_DEFAULTS, from the r3
    fuse-factor sweep) are the single source of truth; the trainers' default
    steps_per_dispatch must agree so `python -m ...trainer` runs at the
    swept optimum."""
    import inspect

    sys.path.insert(0, "/root/repo")
    from bench import FUSE_DEFAULTS
    from genrec_tpu.trainers import (hstu_trainer, rqvae_trainer,
                                     sasrec_trainer, tiger_trainer)

    for model, trainer in (("tiger", tiger_trainer),
                           ("sasrec", sasrec_trainer),
                           ("hstu", hstu_trainer),
                           ("rqvae", rqvae_trainer)):
        default = inspect.signature(
            trainer.train).parameters["steps_per_dispatch"].default
        assert default == FUSE_DEFAULTS[model], (model, default)
