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
    # adapters stay fp32 masters; the frozen base is cast bf16 (halves its
    # footprint — it only feeds the forward)
    is_lora = lora_param_mask(params)
    params = jax.tree_util.tree_map(
        lambda x, m: x if m else x.astype(jnp.bfloat16), params, is_lora)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    # the Engine's trainable/frozen split: grads + Adam state exist only
    # for the adapters (the LCRec trainer's use_lora path, exercised here
    # at production scale)
    from genrec_tpu.core.engine import Engine
    from genrec_tpu.parallel.mesh import make_mesh

    def loss_fn(p, batch, rng):
        del batch, rng
        return model.apply({"params": p}, ids, attention_mask=mask,
                           labels=labels).loss, {}

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    engine = Engine(mesh, loss_fn, optax.adamw(1e-4), params,
                    trainable_mask=is_lora)
    n_train = sum(x.size for x in
                  jax.tree_util.tree_leaves(engine.state.params))
    print(f"params: {n_params/1e9:.2f}B total, {n_train/1e6:.1f}M trainable",
          flush=True)

    print("compiling + warmup...", flush=True)
    t0 = time.perf_counter()
    m = engine.run_step({})
    print(f"first step (incl. compile): {time.perf_counter()-t0:.1f}s "
          f"loss={float(np.asarray(m['loss'])):.3f}", flush=True)
    for _ in range(2):
        m = engine.run_step({})
    float(np.asarray(m["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        m = engine.run_step({})
    float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"qwen2.5-1.5b-shape lora-sft: {dt*1e3:8.1f} ms/step  "
          f"{B/dt:6.1f} ex/s  {B*L/dt:9.0f} tok/s  "
          f"(B={B}, L={L}, rank={args.lora_rank}, 1 chip)", flush=True)
    import json
    print(json.dumps({
        "metric": "qwen_scale_lora_sft_tokens_per_sec_per_chip",
        "value": round(B * L / dt, 1), "unit": "tokens/sec/chip",
        "ms_per_step": round(dt * 1e3, 1), "batch": B, "seq": L,
    }), flush=True)


if __name__ == "__main__":
    main()
