"""Profile one SASRec/HSTU train step on the TPU and print the op table.

Usage: python scripts/profile_step.py --model hstu [--batch 128] [--steps 30]

Companion to scripts/profile_tiger.py (which profiles the TIGER step);
reuses bench.py's model/batch construction so the profiled step is the
benched step.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hstu", choices=["sasrec", "hstu"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--outdir", default="/tmp/step_prof")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.profiling import aggregate_device_ops
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng()
    from genrec_tpu.core.train_state import TrainState, apply_updates

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    num_items, L, B = 12101, 50, args.batch
    if args.model == "sasrec":
        from genrec_tpu.models.sasrec import SASRec
        model = SASRec(num_items=num_items, max_seq_len=L, embed_dim=64,
                       num_heads=2, num_blocks=2, ffn_dim=256, dropout=0.2,
                       dtype=dtype)
    else:
        from genrec_tpu.models.hstu import HSTU
        model = HSTU(num_items=num_items, max_seq_len=L, embed_dim=64,
                     num_heads=2, num_blocks=2, dropout=0.2,
                     use_temporal_bias=True, dtype=dtype)
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(1, num_items + 1, (B, L)), jnp.int32)
    targets = jnp.asarray(rng.integers(1, num_items + 1, (B, L)), jnp.int32)
    kwargs = {}
    if args.model == "hstu":
        ts = np.sort(rng.integers(1.3e9, 1.4e9, (B, L)), axis=1)
        kwargs["timestamps"] = jnp.asarray(ts, jnp.int32)

    params = model.init({"params": jax.random.PRNGKey(0)}, input_ids,
                        targets=targets, **kwargs)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = TrainState.create(params, tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, input_ids, targets, rng, **kw):
        def loss_fn(p):
            out = model.apply({"params": p}, input_ids, targets=targets,
                              deterministic=False, rngs={"dropout": rng},
                              **kw)
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, tx), loss

    key = jax.random.PRNGKey(1)
    print("compiling...", flush=True)
    for _ in range(5):
        key, k = jax.random.split(key)
        state, loss = step(state, input_ids, targets, k, **kwargs)
    float(np.asarray(loss))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, loss = step(state, input_ids, targets, k, **kwargs)
    float(np.asarray(loss))
    dt = time.perf_counter() - t0
    print(f"steady: {dt/args.steps*1e3:.2f} ms/step, "
          f"{B*args.steps/dt:.0f} ex/s", flush=True)

    os.system(f"rm -rf {args.outdir}")
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            state, loss = step(state, input_ids, targets, k, **kwargs)
        float(np.asarray(loss))
    aggregate_device_ops(args.outdir, args.steps)


if __name__ == "__main__":
    main()
