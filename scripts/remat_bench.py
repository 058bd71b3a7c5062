"""Measure TIGER train-step throughput under rematerialization policies.

On a bandwidth-bound step, recomputing cheap elementwise chains in the
backward instead of storing them can beat saving activations. Runs the
paper-config bf16 step with: no remat, dots_saveable (keep matmul outputs,
recompute elementwise), nothing_saveable (recompute everything).

Usage: PYTHONPATH=/root/repo python scripts/remat_bench.py
"""
from __future__ import annotations

import time

import numpy as np


def run(policy_name):
    import jax
    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng()
    from genrec_tpu.core.train_state import TrainState, apply_updates
    from genrec_tpu.models.tiger import Tiger

    model = Tiger(embedding_dim=128, attn_dim=384, dropout=0.1,
                  num_heads=6, n_layers=8, num_item_embeddings=256,
                  num_user_embeddings=10000, sem_id_dim=3,
                  dtype=jnp.bfloat16)
    L, C, K = 20, 3, 256
    rng = np.random.default_rng(0)
    B = 256
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

    policies = {
        "none": None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    pol = policies[policy_name]

    def fwd(p, rng):
        out = model.apply({"params": p}, **batch, deterministic=False,
                          rngs={"dropout": rng})
        return out.loss
    if pol is not None:
        fwd = jax.checkpoint(fwd, policy=pol)

    @jax.jit
    def step(state, rng):
        loss, grads = jax.value_and_grad(fwd)(state.params, rng)
        return apply_updates(state, grads, tx), loss

    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        state, loss = step(state, k)
    float(np.asarray(loss))
    t0 = time.perf_counter()
    steps = 60
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, loss = step(state, k)
    float(np.asarray(loss))
    dt = time.perf_counter() - t0
    print(f"remat={policy_name:8s} {dt/steps*1e3:7.2f} ms/step  "
          f"{B*steps/dt:8.0f} ex/s", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["none", "dots", "nothing"]
    for name in which:
        run(name)
