"""Fused encoder-layer megakernel tests (pallas interpreter on CPU).

Three layers of evidence:
1. deterministic fwd + grads match the standard TransformerBlock
   (T5Attention + FeedForward + RMSNorm composition) — the parity oracle;
2. with dropout, the custom recompute-backward matches jax autodiff of a
   pure-JAX emulator that reproduces the kernel's exact math, including
   the per-(site, grid-block) counter-hash masks — validating the
   hand-derived VJP on the stochastic path;
3. the TransformerBlock fused path (taken automatically under INTERPRET)
   equals the standard path on identical params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genrec_tpu.kernels.encoder_layer as el
from genrec_tpu.kernels.attention import NEG_INF, hash_keep_mask
from genrec_tpu.nn.transformer import (TransformerBlock,
                                       relative_bias_from_table)


@pytest.fixture
def interpret():
    el.INTERPRET = True
    yield
    el.INTERPRET = False


B, S, D, H, F = 5, 13, 128, 2, 256


def _setup(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.5, dtype)
    kpad_bool = np.zeros((B, S), bool)
    kpad_bool[:, -2:] = True
    kpad_bool = jnp.asarray(kpad_bool)
    blk = TransformerBlock(dim=D, num_heads=H, dropout=0.1,
                           ff_hidden_dim=F, cross_attn=False, dtype=dtype)
    params = blk.init({"params": jax.random.PRNGKey(0)}, x,
                      key_padding_mask=kpad_bool,
                      deterministic=True)["params"]
    return x, kpad_bool, blk, params


def _kernel_apply(params, x, kpad_bool, seeds=None, rate=0.0):
    p = params
    bias = relative_bias_from_table(p["self_attn"]["rel_bias"], H, 32, 128,
                                    S, S)
    kpad = jnp.where(kpad_bool, NEG_INF, 0.0)
    return el.fused_encoder_layer(
        x, wq=p["self_attn"]["q"]["kernel"],
        wkv=p["self_attn"]["kv"]["kernel"],
        wo=p["self_attn"]["o"]["kernel"],
        g1=p["norm1"]["weight"], g2=p["norm2"]["weight"],
        wi=p["ff"]["wi"]["kernel"], wo2=p["ff"]["wo"]["kernel"],
        bias=bias, kpad=kpad, n_heads=H, seeds=seeds, dropout_rate=rate)


def test_forward_matches_block(interpret):
    x, kpad_bool, blk, params = _setup()
    ref = blk.apply({"params": params}, x, key_padding_mask=kpad_bool,
                    deterministic=True)
    got = _kernel_apply(params, x, kpad_bool)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_block(interpret):
    x, kpad_bool, blk, params = _setup()

    def loss_ref(params, x):
        y = blk.apply({"params": params}, x, key_padding_mask=kpad_bool,
                      deterministic=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ker(params, x):
        y = _kernel_apply(params, x, kpad_bool)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gk = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    flat_r = jax.tree_util.tree_leaves_with_path(gr[0])
    flat_k = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(gk[0])}
    for kp, v in flat_r:
        k = jax.tree_util.keystr(kp)
        scale = np.abs(np.asarray(v)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(flat_k[k]) / scale,
                                   np.asarray(v) / scale, atol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               atol=1e-4)


def _emulate(x, p, kpad_bool, seeds, rate):
    """Pure-JAX replica of the kernel math incl. grid/pad decomposition."""
    bias = relative_bias_from_table(p["self_attn"]["rel_bias"], H, 32, 128,
                                    S, S)
    kpad = jnp.where(kpad_bool, NEG_INF, 0.0)
    wq = p["self_attn"]["q"]["kernel"]
    wkv = p["self_attn"]["kv"]["kernel"]
    wqkv = jnp.concatenate([wq, wkv], axis=1)
    wo = p["self_attn"]["o"]["kernel"]
    g1 = p["norm1"]["weight"][None].astype(jnp.float32)
    g2 = p["norm2"]["weight"][None].astype(jnp.float32)
    wi = p["ff"]["wi"]["kernel"]
    wo2 = p["ff"]["wo"]["kernel"]
    bs, Sp, Bp = el._plan(B, S)
    dt = x.dtype
    xp = jnp.pad(x, ((0, Bp - B), (0, Sp - S), (0, 0)))
    kpadp = jnp.pad(kpad, ((0, Bp - B), (0, Sp - S)),
                    constant_values=NEG_INF)
    biasp = jnp.pad(bias, ((0, 0), (0, Sp - S), (0, Sp - S)))
    N = bs * Sp
    Dh = D // H
    scale = Dh ** -0.5
    rows = np.arange(N)[:, None] // Sp
    cols = np.arange(N)[None, :] // Sp
    same_neg = jnp.asarray(np.where(rows == cols, 0.0, NEG_INF), jnp.float32)
    P = jnp.asarray(np.arange(N)[:, None] % Sp == np.arange(Sp)[None, :],
                    jnp.float32)
    outs = []
    for ib in range(Bp // bs):
        xb = xp[ib * bs:(ib + 1) * bs].reshape(N, D)
        kpadf = kpadp[ib * bs:(ib + 1) * bs].reshape(N).astype(jnp.float32)
        xf = xb.astype(jnp.float32)
        n1, _, _ = el._rmsnorm(xf, g1, dt)
        qkv = jnp.dot(n1, wqkv.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)
        o_acc = jnp.zeros((N, D), jnp.float32)
        for h in range(H):
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
            vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            s = jnp.dot(qh, kh.T,
                        preferred_element_type=jnp.float32) * scale
            s = s + P @ biasp[h] @ P.T + kpadf[None, :] + same_neg
            pr = jax.nn.softmax(s, axis=-1)
            pd = el._keep(seeds[0], jnp.uint32(ib * H + h), pr.shape, rate,
                          pr).astype(dt)
            att = jnp.dot(pd, vh,
                          preferred_element_type=jnp.float32).astype(dt)
            o_acc = o_acc + jnp.dot(att, wo[h * Dh:(h + 1) * Dh].astype(dt),
                                    preferred_element_type=jnp.float32)
        o = el._keep(seeds[1], jnp.uint32(ib), (N, D), rate,
                     o_acc.astype(dt))
        x2 = xb + o
        n2, _, _ = el._rmsnorm(x2.astype(jnp.float32), g2, dt)
        h1 = jnp.dot(n2, wi.astype(dt),
                     preferred_element_type=jnp.float32).astype(dt)
        h1 = el._keep(seeds[2], jnp.uint32(ib), (N, F), rate,
                      jnp.maximum(h1, 0))
        f = jnp.dot(h1, wo2.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)
        f = el._keep(seeds[3], jnp.uint32(ib), (N, D), rate, f)
        outs.append((x2 + f).reshape(bs, Sp, D))
    return jnp.concatenate(outs, axis=0)[:B, :S]


def test_dropout_forward_matches_emulator(interpret):
    x, kpad_bool, blk, params = _setup()
    seeds = jnp.asarray([11, 22, 33, 44], jnp.int32)
    got = _kernel_apply(params, x, kpad_bool, seeds=seeds, rate=0.3)
    ref = _emulate(x, params, kpad_bool, seeds, 0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # seed sensitivity
    got2 = _kernel_apply(params, x, kpad_bool,
                         seeds=jnp.asarray([1, 2, 3, 4], jnp.int32),
                         rate=0.3)
    assert np.abs(np.asarray(got2) - np.asarray(got)).max() > 1e-3


def test_dropout_grads_match_emulator_autodiff(interpret):
    x, kpad_bool, blk, params = _setup()
    seeds = jnp.asarray([7, 8, 9, 10], jnp.int32)

    def loss_ker(params, x):
        y = _kernel_apply(params, x, kpad_bool, seeds=seeds, rate=0.25)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_emu(params, x):
        y = _emulate(x, params, kpad_bool, seeds, 0.25)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gk = jax.grad(loss_ker, argnums=(0, 1))(params, x)
    ge = jax.grad(loss_emu, argnums=(0, 1))(params, x)
    flat_e = jax.tree_util.tree_leaves_with_path(ge[0])
    flat_k = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(gk[0])}
    for kp, v in flat_e:
        k = jax.tree_util.keystr(kp)
        scale = np.abs(np.asarray(v)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(flat_k[k]) / scale,
                                   np.asarray(v) / scale, atol=2e-5,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(ge[1]),
                               atol=2e-4)


def test_block_fused_path_equals_standard(interpret):
    """Under INTERPRET the block takes the fused path automatically; its
    params and outputs must be interchangeable with the standard path."""
    x, kpad_bool, blk, params = _setup()
    fused = blk.apply({"params": params}, x, key_padding_mask=kpad_bool,
                      deterministic=True)
    el.INTERPRET = False    # standard path (CPU: kernel unsupported)
    std = blk.apply({"params": params}, x, key_padding_mask=kpad_bool,
                    deterministic=True)
    el.INTERPRET = True
    np.testing.assert_allclose(np.asarray(fused), np.asarray(std),
                               atol=2e-5, rtol=2e-5)


def test_bf16_close_to_fp32(interpret):
    x, kpad_bool, blk, params = _setup()
    ref = _kernel_apply(params, x, kpad_bool)
    xb = x.astype(jnp.bfloat16)
    blk16 = TransformerBlock(dim=D, num_heads=H, dropout=0.1,
                             ff_hidden_dim=F, cross_attn=False,
                             dtype=jnp.bfloat16)
    del blk16  # params are dtype-agnostic; kernel casts by x.dtype
    got = _kernel_apply(params, xb, kpad_bool)
    assert got.dtype == jnp.bfloat16
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    assert err.max() < 0.15, err.max()
