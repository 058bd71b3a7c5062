"""Probe: does scan-fused multi-step dispatch help SASRec-scale steps?

RQ-VAE (µs-scale compute) gained 11.7× from run_steps; SASRec/HSTU steps
are ~2.5 ms, so the dispatch share is unclear — measure it directly.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.engine import make_fused_train_step, make_train_step
    from genrec_tpu.core.train_state import TrainState
    from genrec_tpu.models.sasrec import SASRec
    from genrec_tpu.parallel import make_mesh

    B, L, num_items, S = 128, 50, 12101, 8
    model = SASRec(num_items=num_items, max_seq_len=L, embed_dim=64,
                   num_heads=2, num_blocks=2, ffn_dim=256, dropout=0.2,
                   fused_ce=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ii = jnp.asarray(rng.integers(1, num_items + 1, (S, B, L)), jnp.int32)
    tt = jnp.asarray(rng.integers(1, num_items + 1, (S, B, L)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ii[0],
                        targets=tt[0])["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    mesh = make_mesh()

    def loss_fn(p, batch, rng):
        out = model.apply({"params": p}, batch["i"], targets=batch["t"],
                          deterministic=False, rngs={"dropout": rng})
        return out.loss, {}

    single = make_train_step(loss_fn, tx, mesh)
    fused = make_fused_train_step(loss_fn, tx, mesh)

    import jax.tree_util as jtu
    host_params = jtu.tree_map(np.asarray, params)  # donation-proof copy

    def timeit(label, fn, n_dispatch, steps_per_dispatch):
        st = TrainState.create(jtu.tree_map(jnp.asarray, host_params), tx)
        key = jax.random.PRNGKey(1)
        m = None
        for _ in range(5):                       # warmup
            key, k = jax.random.split(key)
            st, m = fn(st, k)
        jax.block_until_ready(m["loss"])
        float(np.asarray(m["loss"]))
        for rep in range(3):
            t0 = time.perf_counter()
            for _ in range(n_dispatch):
                key, k = jax.random.split(key)
                st, m = fn(st, k)
            float(np.asarray(m["loss"]))
            dt = time.perf_counter() - t0
            eps = B * steps_per_dispatch * n_dispatch / dt
            print(f"{label} rep{rep}: {eps:,.0f} ex/s "
                  f"({dt / (n_dispatch * steps_per_dispatch) * 1e3:.3f} "
                  f"ms/step)", flush=True)

    timeit("single", lambda st, k: single(st, {"i": ii[0], "t": tt[0]}, k),
           n_dispatch=100, steps_per_dispatch=1)
    timeit(f"fused-{S}", lambda st, k: fused(st, {"i": ii, "t": tt}, k),
           n_dispatch=100 // S, steps_per_dispatch=S)


if __name__ == "__main__":
    main()
