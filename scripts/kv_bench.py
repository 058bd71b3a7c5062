"""Measure LCRec constrained-decode speedup from the KV cache on TPU.

Cacheless decoding re-runs the full growing prefix per level (the round-1
design); the cached path prefills once and decodes single tokens. At
512-token prompts x 10 beams (the reference's eval shape with a real
backbone) the cacheless forward cost explodes; this prints both times.

Usage: PYTHONPATH=/root/repo python scripts/kv_bench.py [--len 512]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--len", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beams", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng()
    from genrec_tpu.models.lcrec import LCRec

    model = LCRec(d_model=512, n_layers=8, n_heads=8, n_kv_heads=4,
                  ff_dim=1408, base_vocab=30000,
                  max_len=args.len + 8, num_codebooks=3, codebook_size=256,
                  dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, L = args.batch, args.len
    ids = rng.integers(4, 29000, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    for b in range(B):      # varying left padding
        pad = int(rng.integers(0, L // 4))
        ids[b, :pad] = 0
        mask[b, :pad] = 0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    results = {}
    for name, use_cache in [("cached", True), ("cacheless", False)]:
        gen = model.make_generate_topk(num_beams=args.beams,
                                       use_cache=use_cache)
        out = gen(params, ids, mask)           # compile
        np.asarray(out.sem_ids)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = gen(params, ids, mask)
        np.asarray(out.sem_ids)
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name:10s} {dt*1e3:8.2f} ms/batch "
              f"({B*args.beams/dt:7.0f} beam-seqs/s)", flush=True)
    print(f"speedup: {results['cacheless']/results['cached']:.2f}x "
          f"(prompt len {L}, {args.beams} beams, B={B})", flush=True)


if __name__ == "__main__":
    main()
