"""Fused FFN-block kernel tests (pallas interpreter on CPU).

Mirrors tests/test_encoder_layer.py's evidence layers:
1. deterministic fwd + grads match the standard RMSNorm+FeedForward
   composition;
2. with dropout, the hand-derived VJP matches jax autodiff of a pure-JAX
   emulator reproducing the kernel's exact math (per-row-block
   counter-hash masks included);
3. the TransformerBlock fused-FFN path (taken automatically under
   INTERPRET) equals the standard path on identical params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genrec_tpu.kernels.ffn_block as fb
from genrec_tpu.kernels.attention import hash_keep_mask


@pytest.fixture
def interpret():
    fb.INTERPRET = True
    old_rows = fb._ROWS
    fb._ROWS = 16          # several grid blocks at test sizes
    yield
    fb.INTERPRET = False
    fb._ROWS = old_rows


N, D, F = 37, 128, 256


def _setup(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)) * 0.5, dtype)
    g = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    wi = jnp.asarray(rng.normal(size=(D, F)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(F, D)) * 0.1, jnp.float32)
    return x, g, wi, wo


def _reference(x, g, wi, wo):
    """Standard-path math (RMSNorm with round-before-scale, fp32 norm)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
    n = ((xf * r).astype(dt).astype(jnp.float32) * g).astype(dt)
    h = jnp.maximum(jnp.dot(n, wi.astype(dt),
                            preferred_element_type=jnp.float32), 0.0)
    f = jnp.dot(h.astype(dt), wo.astype(dt),
                preferred_element_type=jnp.float32).astype(dt)
    return x + f


def test_deterministic_matches_reference(interpret):
    x, g, wi, wo = _setup()
    y = fb.fused_ffn_block(x, g=g, wi=wi, wo=wo, dropout_rate=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_reference(
        x, g, wi, wo)), atol=1e-5)

    def loss_k(x, g, wi, wo):
        return jnp.sum(fb.fused_ffn_block(x, g=g, wi=wi, wo=wo,
                                          dropout_rate=0.0) ** 2)

    def loss_r(x, g, wi, wo):
        return jnp.sum(_reference(x, g, wi, wo) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, g, wi, wo)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, g, wi, wo)
    for a, b, name in zip(gk, gr, ("dx", "dg", "dwi", "dwo")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, err_msg=name)


def _emulate(x, g, wi, wo, seeds, rate, rows):
    """Pure-JAX replica of the kernel's math incl. per-block hash masks."""
    dt = x.dtype
    n_rows = x.shape[0]
    pad = -n_rows % rows
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    outs = []
    for ib in range(xp.shape[0] // rows):
        xb = xp[ib * rows:(ib + 1) * rows]
        xf = xb.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
        n = ((xf * r).astype(dt).astype(jnp.float32) * g).astype(dt)
        h1f = jnp.dot(n, wi.astype(dt), preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1f, 0.0).astype(dt)
        keep2 = hash_keep_mask(seeds[0], jnp.uint32(ib), h1.shape, rate)
        h1 = jnp.where(keep2, h1 / (1.0 - rate), 0.0).astype(dt)
        f = jnp.dot(h1, wo.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)
        keep3 = hash_keep_mask(seeds[1], jnp.uint32(ib), f.shape, rate)
        f = jnp.where(keep3, f / (1.0 - rate), 0.0).astype(dt)
        outs.append(xb + f)
    return jnp.concatenate(outs, axis=0)[:n_rows]


def test_dropout_vjp_matches_emulator_autodiff(interpret):
    x, g, wi, wo = _setup()
    seeds = jnp.asarray([11, 22], jnp.int32)
    rate = 0.3

    yk = fb.fused_ffn_block(x, g=g, wi=wi, wo=wo, seeds=seeds,
                            dropout_rate=rate)
    ye = _emulate(x, g, wi, wo, seeds, rate, fb._ROWS)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(ye), atol=1e-5)

    def loss_k(x, g, wi, wo):
        return jnp.sum(fb.fused_ffn_block(
            x, g=g, wi=wi, wo=wo, seeds=seeds, dropout_rate=rate) ** 2)

    def loss_e(x, g, wi, wo):
        return jnp.sum(_emulate(x, g, wi, wo, seeds, rate, fb._ROWS) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, g, wi, wo)
    ge = jax.grad(loss_e, argnums=(0, 1, 2, 3))(x, g, wi, wo)
    for a, b, name in zip(gk, ge, ("dx", "dg", "dwi", "dwo")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, err_msg=name)


def test_transformer_block_fused_ffn_path(interpret):
    from genrec_tpu.nn.transformer import TransformerBlock
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 9, D)) * 0.5, jnp.float32)
    blk = TransformerBlock(dim=D, num_heads=4, dropout=0.0,
                           ff_hidden_dim=F)
    params = blk.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    y_fused = blk.apply({"params": params}, x)
    fb.INTERPRET = False      # forces the standard FeedForward path
    y_std = blk.apply({"params": params}, x)
    fb.INTERPRET = True
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_std),
                               atol=1e-5)
