"""LCRec SFT train-step throughput (B=16, L=512 Qwen2-family backbone).

The decoder-only attention at this shape materialises (B, H, 512, 512)
fp32 scores per layer under plain XLA; the fused softmax kernel keeps them
in VMEM. A/B with GENREC_TPU_NO_FUSED_ATTENTION=1.

Usage: PYTHONPATH=/root/repo python scripts/lcrec_sft_bench.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng()
    from genrec_tpu.core.train_state import TrainState, apply_updates
    from genrec_tpu.models.llm import CausalLM

    import os
    fused_ce = not os.environ.get("GENREC_TPU_NO_FUSED_CE")
    model = CausalLM(vocab_size=32000, d_model=512, n_layers=8, n_heads=8,
                     n_kv_heads=4, ff_dim=1408, max_len=520,
                     fused_ce=fused_ce, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    B, L = 16, 512
    ids = jnp.asarray(rng.integers(4, 31000, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 31000, (B, L)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = TrainState.create(params, tx)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state):
        def loss_fn(p):
            out = model.apply({"params": p}, ids, attention_mask=mask,
                              labels=labels)
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_updates(state, grads, tx), loss

    for _ in range(3):
        state, loss = step(state)
    float(np.asarray(loss))
    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state)
    float(np.asarray(loss))
    dt = time.perf_counter() - t0
    tag = "xla" if os.environ.get("GENREC_TPU_NO_FUSED_ATTENTION") \
        else "fused"
    tag += "+ce" if fused_ce else "+naive-ce"
    print(f"lcrec-sft[{tag}]: {dt/steps*1e3:7.2f} ms/step  "
          f"{B*steps/dt:7.0f} ex/s  ({B*L*steps/dt:9.0f} tok/s)",
          flush=True)


if __name__ == "__main__":
    main()
