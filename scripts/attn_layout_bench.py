"""Micro-bench: attention einsum formulations vs XLA layout copies.

OUTCOME (v5e, recorded for posterity): in this isolated chain the
explicit head-major transposes measured 7.7 ms fwd+bwd vs 12.6 ms for
the implicit-batch "bqhd,bkhd->bhqk" form — but the FULL TIGER step A/B
showed NO difference (19.1-19.4k vs ~19.4k ex/s over 3+2 warm runs).
With the producer Dense matmuls present, XLA assigns operand layouts for
the dots either way; this bench's grad-of-sum scan context lacks them
and so overstates the relayout cost. Kept as a cautionary example: layout
micro-benches must include the producers/consumers of the tensors whose
layouts they probe.

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python scripts/attn_layout_bench.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from genrec_tpu.kernels.attention import _hash_softmax

    B, S, H, Dh = 256, 61, 6, 64
    D = H * Dh
    scale = Dh ** -0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, S, S)), jnp.float32)
    kpad = jnp.zeros((B, S), jnp.float32)
    seed = jnp.int32(3)

    def v_current(q, k, v):
        """bqhd,bkhd->bhqk (what fused_attention does today)."""
        qh = q.reshape(B, S, H, Dh)
        kh = k.reshape(B, S, H, Dh)
        vh = v.reshape(B, S, H, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
        p = _hash_softmax(s, bias, kpad, seed, scale, 0.1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        return o.reshape(B, S, D)

    def v_headmajor(q, k, v):
        """explicit transpose to (B,H,S,Dh) once, then bhqd,bhkd->bhqk."""
        qh = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        p = _hash_softmax(s, bias, kpad, seed, scale, 0.1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vh,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        return o.transpose(0, 2, 1, 3).reshape(B, S, D)

    def v_flatbatch(q, k, v):
        """collapse (B,H) into one batch dim: zqd,zkd->zqk."""
        qh = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3).reshape(-1, S, Dh)
        kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3).reshape(-1, S, Dh)
        vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3).reshape(-1, S, Dh)
        s = jnp.einsum("zqd,zkd->zqk", qh, kh).reshape(B, H, S, S)
        p = _hash_softmax(s, bias, kpad, seed, scale, 0.1)
        o = jnp.einsum("zqk,zkd->zqd", p.astype(q.dtype).reshape(-1, S, S),
                       vh, preferred_element_type=jnp.float32).astype(q.dtype)
        return o.reshape(B, H, S, Dh).transpose(0, 2, 1, 3).reshape(B, S, D)

    def v_seqmajor(q, k, v):
        """keep (B,S,H,Dh) layout; contract via dot_general with h as a
        batch dim in place (no transposes at all): qhd x khd over d."""
        qh = q.reshape(B, S, H, Dh)
        kh = k.reshape(B, S, H, Dh)
        vh = v.reshape(B, S, H, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        p = _hash_softmax(s, bias, kpad, seed, scale, 0.1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        return o.reshape(B, S, D)

    variants = [("current(bqhd)", v_current), ("headmajor(bhqd)", v_headmajor),
                ("flatbatch(zqd)", v_flatbatch), ("f32score(bqhd)", v_seqmajor)]

    for name, fn in variants:
        f = jax.grad(lambda q: jnp.sum(fn(q, k, v).astype(jnp.float32)))
        chain = jax.jit(lambda q0: jax.lax.scan(
            lambda c, _: (f(c) * 1e-3 + q, None), q0, None, length=50)[0])
        r = chain(q)
        float(np.asarray(r, np.float32).sum())
        t0 = time.perf_counter()
        r = chain(q)
        float(np.asarray(r, np.float32).sum())
        dt = (time.perf_counter() - t0) / 50
        print(f"{name:18s} fwd+bwd: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
