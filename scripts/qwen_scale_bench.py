"""Qwen2.5-1.5B-shape LoRA SFT throughput on one chip.

Exercises the production-scale LCRec path the reference runs on GPU
clusters (`/root/reference/config/lcrec/amazon/lcrec.gin:12-48`:
Qwen2.5-1.5B backbone): 28 layers, d=1536, GQA 12/2 heads, ff 8960,
vocab 151936, L=512. Feasible on a single v5e only because of
(a) LoRA: the base stays frozen bf16, grads/optimizer exist for the
    adapters alone (the trainable/frozen split is explicit here, not an
    optax mask, so the full-tree fp32 grad pytree never materialises);
(b) the fused chunked CE: naive (B, L, 151936) fp32 logits would be
    ~1.2 GB *per tensor* at B=4 — ops/fused_ce.py streams the vocab;
(c) per-block rematerialisation (CausalLM(remat=True)).

Usage: python scripts/qwen_scale_bench.py [--batch 4] [--steps 10]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--lora-rank", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-sized smoke of the same step mechanics")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng()
    from genrec_tpu.models.llm import CausalLM, lora_param_mask

    if args.tiny:
        args.seq = min(args.seq, 32)
        model = CausalLM(
            vocab_size=512, d_model=64, n_layers=2, n_heads=4,
            n_kv_heads=2, ff_dim=128, max_len=args.seq + 8,
            tie_embeddings=True, remat=True,
            lora_rank=args.lora_rank, dtype=jnp.bfloat16)
        vocab = 512
    else:
        model = CausalLM(
            vocab_size=151936, d_model=1536, n_layers=28, n_heads=12,
            n_kv_heads=2, ff_dim=8960, max_len=args.seq + 8,
            rope_theta=1000000.0, tie_embeddings=True, remat=True,
            lora_rank=args.lora_rank, dtype=jnp.bfloat16)
        vocab = 151000

    rng = np.random.default_rng(0)
    B, L = args.batch, args.seq
    ids = jnp.asarray(rng.integers(4, vocab, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    labels = jnp.asarray(rng.integers(0, vocab, (B, L)), jnp.int32)

    print("initializing params...", flush=True)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    # explicit trainable/frozen split: full-tree grads never materialise
    is_lora = lora_param_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_mask = jax.tree_util.tree_leaves(is_lora)
    train_tree = {}
    for (path, leaf), m in zip(flat, flat_mask):
        if m:
            train_tree["/".join(str(getattr(p, "key", p)) for p in path)] = \
                leaf.astype(jnp.float32)
    n_train = sum(x.size for x in train_tree.values())
    print(f"params: {n_params/1e9:.2f}B total, {n_train/1e6:.1f}M trainable",
          flush=True)

    def merge(frozen, trainable):
        flat2 = jax.tree_util.tree_flatten_with_path(frozen)
        leaves = []
        for (path, leaf) in flat2[0]:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            leaves.append(trainable[key].astype(leaf.dtype)
                          if key in trainable else leaf)
        return jax.tree_util.tree_unflatten(flat2[1], leaves)

    tx = optax.adamw(1e-4)
    opt_state = tx.init(train_tree)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(trainable, opt_state, frozen):
        def loss_fn(t):
            p = merge(frozen, t)
            return model.apply({"params": p}, ids, attention_mask=mask,
                               labels=labels).loss
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    print("compiling + warmup...", flush=True)
    t0 = time.perf_counter()
    train_tree, opt_state, loss = step(train_tree, opt_state, params)
    print(f"first step (incl. compile): {time.perf_counter()-t0:.1f}s "
          f"loss={float(np.asarray(loss)):.3f}", flush=True)
    for _ in range(2):
        train_tree, opt_state, loss = step(train_tree, opt_state, params)
    float(np.asarray(loss))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        train_tree, opt_state, loss = step(train_tree, opt_state, params)
    float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"qwen2.5-1.5b-shape lora-sft: {dt*1e3:8.1f} ms/step  "
          f"{B/dt:6.1f} ex/s  {B*L/dt:9.0f} tok/s  "
          f"(B={B}, L={L}, rank={args.lora_rank}, 1 chip)", flush=True)


if __name__ == "__main__":
    main()
