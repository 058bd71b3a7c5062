"""Dump the optimized HLO of the TIGER bench step and summarize copies.

Usage: python scripts/dump_tiger_hlo.py [--out /tmp/tiger_step.hlo]

Compiles the exact bench.py step (cached after the first bench run) and
prints every `copy`/`transpose` instruction with its shape+layout so the
trace's copy.* rows can be attributed to graph positions.
"""
from __future__ import annotations

import argparse
import functools
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tiger_step.hlo")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

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

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, **batch, deterministic=False,
                              rngs={"dropout": rng})
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, tx), loss

    print("compiling...", flush=True)
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {args.out}", flush=True)

    # Summarize copy instructions by shape.
    pat = re.compile(r"^\s*%?(copy[.\w]*) = (\S+) copy\(", re.M)
    shapes = defaultdict(int)
    for m in pat.finditer(txt):
        shapes[m.group(2)] += 1
    print("\ncopy instructions by shape (count):")
    for s, c in sorted(shapes.items(), key=lambda kv: -kv[1]):
        print(f"  {c:4d}  {s}")


if __name__ == "__main__":
    main()
