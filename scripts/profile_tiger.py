"""Profile one TIGER train step on the real TPU and print the op-time table.

Usage:  python scripts/profile_tiger.py [--dtype bfloat16] [--batch 256]

Writes a jax.profiler trace under /tmp/tiger_prof, then parses the
*.trace.json.gz and aggregates device-side op durations by name so we can
see where the bf16 step time goes (VERDICT round-1 task #1).
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--outdir", default="/tmp/tiger_prof")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng()
    from genrec_tpu.core.train_state import TrainState, apply_updates
    from genrec_tpu.models.tiger import Tiger

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = Tiger(embedding_dim=128, attn_dim=384, dropout=0.1,
                  num_heads=6, n_layers=8, num_item_embeddings=256,
                  num_user_embeddings=10000, sem_id_dim=3, dtype=dtype)
    L, C, K = 20, model.sem_id_dim, model.num_item_embeddings
    rng = np.random.default_rng(0)
    B = args.batch
    batch = dict(
        user_ids=jnp.asarray(rng.integers(0, 10000, B), jnp.int32),
        sem_ids=jnp.asarray(rng.integers(0, K, (B, L * C)), jnp.int32),
        token_type_ids=jnp.asarray(np.tile(np.arange(C), (B, L)), jnp.int32),
        sem_ids_fut=jnp.asarray(rng.integers(0, K, (B, C)), jnp.int32),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(C), (B, 1)),
                                       jnp.int32),
        seq_mask=jnp.ones((B, L * C), bool))
    params = model.init({"params": jax.random.PRNGKey(0)}, **batch)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = TrainState.create(params, tx)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, **batch, deterministic=False,
                              rngs={"dropout": rng})
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, tx), loss

    key = jax.random.PRNGKey(1)
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
    float(np.asarray(loss))
    print(f"warmup done in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
    float(np.asarray(loss))
    dt = time.perf_counter() - t0
    print(f"steady: {dt/args.steps*1e3:.2f} ms/step, "
          f"{B*args.steps/dt:.0f} ex/s", flush=True)

    os.system(f"rm -rf {args.outdir}")
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            state, loss = step(state, batch, k)
        float(np.asarray(loss))

    paths = glob.glob(f"{args.outdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    # find TPU device pid
    pid_name = {e["pid"]: e.get("args", {}).get("name", "")
                for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_name.items() if "TPU" in n or "Axon" in n}
    print("pids:", pid_name, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"\ntotal device time {total/1e3:.1f} ms over {args.steps} steps "
          f"=> {total/1e3/args.steps:.2f} ms/step device-side")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/args.steps/1e3:9.3f} ms/step  x{cnt[name]//args.steps:<4d}"
              f" {name[:110]}")


if __name__ == "__main__":
    main()
