"""TPU-hardware validation of the fused kernels (driver-runnable).

Checks BOTH fused-softmax attention backends — the default pure-XLA
counter-hash path and the opt-in pallas kernel (``GENREC_TPU_ATTN_PALLAS``)
— plus the hash/pallas dropout variants and the nearest-codeword kernel
(tests/test_kernels.py exercises the same bodies on CPU): forward/grad
parity vs the XLA oracle, dropout statistics, seed reproducibility and
fwd/bwd mask identity. Exits non-zero on any failure.

Usage: PYTHONPATH=/root/repo python scripts/tpu_kernel_check.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

failures = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        failures.append(name)


def check_attention_backend(tag):
    import jax
    import jax.numpy as jnp
    import genrec_tpu.kernels.attention as A

    rng = np.random.default_rng(0)
    B, Sq, Sk, H, Dh = 32, 61, 61, 6, 64
    q = jnp.asarray(rng.normal(size=(B, Sq, H * Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Sk, H * Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Sk, H * Dh)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, Sq, Sk)), jnp.float32)
    kpad = jnp.where(jnp.asarray(rng.random((B, Sk)) < 0.2), -1e9,
                     0.0).astype(jnp.float32).at[:, 0].set(0.0)

    # forward parity (fp32)
    out_k = np.asarray(A.fused_attention(q, k, v, bias, kpad, n_heads=H))
    out_x = np.asarray(A.fused_attention_xla(q, k, v, bias, kpad, 0, 0.0, H))
    diff = np.abs(out_k - out_x).max()
    check(f"{tag}_fwd_fp32", diff < 1e-4, f"maxdiff={diff:.2e}")

    # forward parity (bf16 inputs)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out_kb = np.asarray(A.fused_attention(qb, kb, vb, bias, kpad,
                                          n_heads=H), np.float32)
    out_xb = np.asarray(A.fused_attention_xla(qb, kb, vb, bias, kpad, 0,
                                              0.0, H), np.float32)
    diffb = np.abs(out_kb - out_xb).max()
    check(f"{tag}_fwd_bf16", diffb < 3e-2, f"maxdiff={diffb:.2e}")

    # gradient parity
    def lk(q, k, v, bias):
        return jnp.sum(A.fused_attention(q, k, v, bias, kpad,
                                         n_heads=H) ** 2)

    def lx(q, k, v, bias):
        return jnp.sum(A.fused_attention_xla(q, k, v, bias, kpad, 0,
                                             0.0, H) ** 2)
    gk = jax.grad(lk, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(lx, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, nm in zip(gk, gx, ["dq", "dk", "dv", "dbias"]):
        m = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        check(f"{tag}_grad_{nm}", m < 1e-3, f"relmax={m:.2e}")

    # dropout: determinism per seed, mean preservation
    rate = 0.5
    d1 = A.fused_attention(q, k, v, bias, kpad, n_heads=H, seed=123,
                           dropout_rate=rate)
    d2 = A.fused_attention(q, k, v, bias, kpad, n_heads=H, seed=123,
                           dropout_rate=rate)
    d3 = A.fused_attention(q, k, v, bias, kpad, n_heads=H, seed=124,
                           dropout_rate=rate)
    check(f"{tag}_dropout_reproducible", bool(jnp.all(d1 == d2)))
    check(f"{tag}_dropout_seed_sensitive", not bool(jnp.all(d1 == d3)))
    # E[out] preserved: with v = ones, out rows are Σ(kept p / kp) whose
    # expectation is exactly 1
    ones = jnp.ones_like(v)
    do_mean = float(jnp.mean(A.fused_attention(
        q, k, ones, bias, kpad, n_heads=H, seed=123, dropout_rate=rate)))
    check(f"{tag}_dropout_mean_preserved", abs(do_mean - 1.0) < 0.05,
          f"mean={do_mean:.4f} (expect 1.0)")
    g = jax.grad(lambda q: jnp.sum(A.fused_attention(
        q, k, v, bias, kpad, n_heads=H, seed=7,
        dropout_rate=rate) ** 2))(q)
    check(f"{tag}_dropout_grad_finite", bool(jnp.isfinite(g).all()))

    # fwd/bwd dropout mask consistency: out is linear in v at fixed seed, so
    # the secant difference is exact — use a large eps so it dominates fp32
    # accumulation noise of the 750k-element sums
    eps = 64.0
    gv = jax.grad(lambda v: jnp.sum(A.fused_attention(
        q, k, v, bias, kpad, n_heads=H, seed=7, dropout_rate=rate)))(v)
    v2 = v.at[0, 0, 0].add(eps)
    f1 = jnp.sum(A.fused_attention(q, k, v, bias, kpad, n_heads=H,
                                   seed=7, dropout_rate=rate))
    f2 = jnp.sum(A.fused_attention(q, k, v2, bias, kpad, n_heads=H,
                                   seed=7, dropout_rate=rate))
    fd = float((f2 - f1) / eps)
    an = float(gv[0, 0, 0])
    check(f"{tag}_dropout_fwd_bwd_mask_match",
          abs(fd - an) < 0.05 * max(1.0, abs(an)),
          f"fd={fd:.4f} analytic={an:.4f}")


def check_dropout_fn(fn, tag):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    xx = jnp.asarray(rng.normal(size=(256, 61, 384)), jnp.bfloat16)
    y1 = fn(xx, 5, 0.3)
    y2 = fn(xx, 5, 0.3)
    check(f"{tag}_reproducible", bool(jnp.all(y1 == y2)))
    frac = float((np.asarray(y1, np.float32) == 0).mean())
    check(f"{tag}_frac", abs(frac - 0.3) < 0.01, f"frac={frac:.4f}")
    w = jnp.asarray(rng.normal(size=xx.shape), jnp.bfloat16)
    gm = jax.grad(lambda x: jnp.sum((fn(x, 5, 0.3)
                                     * w).astype(jnp.float32)))(xx)
    same = bool(jnp.all((np.asarray(gm, np.float32) == 0)
                        == (np.asarray(y1, np.float32) == 0)))
    check(f"{tag}_bwd_mask_identity", same)


def main():
    import jax
    import jax.numpy as jnp
    import genrec_tpu.kernels.attention as A

    assert jax.default_backend() == "tpu", jax.default_backend()

    assert A._attention_backend() == "xla_hash"
    check_attention_backend("attn_hash")
    os.environ["GENREC_TPU_ATTN_PALLAS"] = "1"
    assert A._attention_backend() == "pallas"
    check_attention_backend("attn_pallas")
    del os.environ["GENREC_TPU_ATTN_PALLAS"]

    from genrec_tpu.kernels.dropout import fused_dropout, hash_dropout
    check_dropout_fn(hash_dropout, "hash_dropout")
    check_dropout_fn(fused_dropout, "pallas_dropout")

    # nearest-codeword kernel (TPU path)
    rng = np.random.default_rng(0)
    from genrec_tpu.kernels.codebook import (nearest_codeword,
                                             nearest_codeword_xla)
    x = jnp.asarray(rng.normal(size=(4096, 64)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32)
    ids, _ = nearest_codeword(x, c)
    ids2, _ = nearest_codeword_xla(x, c)
    check("nearest_codeword_tpu", bool(jnp.all(ids == ids2)))

    # micro-benchmark: hash vs pallas vs plain attention fwd+bwd
    B2, Sq, Sk, H, Dh = 256, 61, 61, 6, 64
    bias = jnp.asarray(rng.normal(size=(H, Sq, Sk)), jnp.float32)
    qq = jnp.asarray(rng.normal(size=(B2, Sq, H * Dh)), jnp.bfloat16)

    def bench(f, nm):
        # chain 50 calls inside one jit so the axon per-dispatch overhead
        # (~20 ms) doesn't swamp the sub-ms kernels
        chain = jax.jit(lambda q0: jax.lax.scan(
            lambda c, _: (f(c) * 1e-3 + qq, None), q0, None, length=50)[0])
        r = chain(qq)
        float(np.asarray(r).sum())
        t0 = time.perf_counter()
        r = chain(qq)
        float(np.asarray(r).sum())
        dt = (time.perf_counter() - t0) / 50
        print(f"bench attention fwd+bwd {nm}: {dt*1e3:.3f} ms/call",
              flush=True)

    f_hash = jax.grad(lambda q: jnp.sum(A.fused_attention(
        q, qq, qq, bias, None, n_heads=H, seed=3, dropout_rate=0.1)))
    f_xla = jax.grad(lambda q: jnp.sum(A.fused_attention_xla(
        q, qq, qq, bias, jnp.zeros((B2, Sk)), 3, 0.1, H)))
    bench(f_hash, "hash")
    bench(f_xla, "xla")
    os.environ["GENREC_TPU_ATTN_PALLAS"] = "1"
    f_pallas = jax.grad(lambda q: jnp.sum(A.fused_attention(
        q, qq, qq, bias, None, n_heads=H, seed=3, dropout_rate=0.1)))
    bench(f_pallas, "pallas")
    del os.environ["GENREC_TPU_ATTN_PALLAS"]

    print(f"\n{len(failures)} failures", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
