"""Pallas kernel tests (CPU fallback path; TPU path validated on hardware —
exact id match and 2.8x speedup vs XLA at 8192x4096x64).

The fused-attention/dropout kernel bodies run here via the Pallas
*interpreter* (``INTERPRET`` flags), so the exact kernel arithmetic —
including the counter-based dropout hash — is exercised on CPU, not just
the XLA fallback. ``scripts/tpu_kernel_check.py`` repeats the checks on
real hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genrec_tpu.kernels.attention as fattn
from genrec_tpu.kernels.codebook import nearest_codeword, nearest_codeword_xla


@pytest.fixture
def interpret_attention():
    fattn.INTERPRET = True
    yield
    fattn.INTERPRET = False


def _attn_inputs(B=4, Sq=13, Sk=17, H=6, Dh=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, Sq, H * Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Sk, H * Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Sk, H * Dh)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H, Sq, Sk)), jnp.float32)
    kpad = jnp.where(jnp.asarray(rng.random((B, Sk)) < 0.2),
                     -1e9, 0.0).astype(jnp.float32)
    return q, k, v, bias, kpad, H


def test_fused_attention_forward_matches_xla(interpret_attention):
    q, k, v, bias, kpad, H = _attn_inputs()
    out_k = fattn.fused_attention(q, k, v, bias, kpad, n_heads=H)
    out_x = fattn.fused_attention_xla(q, k, v, bias, kpad, 0, 0.0, H)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_none_masks_and_odd_batch(interpret_attention):
    q, k, v, _, _, H = _attn_inputs(B=3, Sq=7, Sk=7)
    out_k = fattn.fused_attention(q, k, v, None, None, n_heads=H)
    zb = jnp.zeros((H, 7, 7), jnp.float32)
    zp = jnp.zeros((3, 7), jnp.float32)
    out_x = fattn.fused_attention_xla(q, k, v, zb, zp, 0, 0.0, H)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_gradients_match_xla(interpret_attention):
    q, k, v, bias, kpad, H = _attn_inputs()

    def loss_kernel(q, k, v, bias):
        return jnp.sum(fattn.fused_attention(
            q, k, v, bias, kpad, n_heads=H) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(fattn.fused_attention_xla(
            q, k, v, bias, kpad, 0, 0.0, H) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gk, gx, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_t5attention_fused_path_matches_unfused(interpret_attention):
    """Module-level: the fused kernel plugged into T5Attention reproduces
    the unfused path (deterministic; causal mask + padding + rel bias)."""
    from genrec_tpu.nn.transformer import T5Attention, causal_mask
    B, S, D, H = 3, 9, 96, 6
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    # keep key 0 visible: a fully-masked query row (causal row 0 with key 0
    # padded) is degenerate — both paths emit arbitrary values there
    kpm = jnp.asarray(rng.random((B, S)) < 0.2).at[:, 0].set(False)
    mod_f = T5Attention(D, H, dropout=0.0, use_fused=True)
    mod_u = T5Attention(D, H, dropout=0.0, use_fused=False)
    params = mod_u.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    out_f = mod_f.apply({"params": params}, x, attn_mask=causal_mask(S),
                        key_padding_mask=kpm, deterministic=True)
    out_u = mod_u.apply({"params": params}, x, attn_mask=causal_mask(S),
                        key_padding_mask=kpm, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_cpu_dispatch_falls_back():
    """Without INTERPRET, CPU must take the XLA path (no pallas TPU call)."""
    assert not fattn.fused_attention_supported((4, 13, 384), 6)


def test_nearest_codeword_cpu_fallback_correct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(100, 16)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    ids, dists = nearest_codeword(x, c)
    # brute force
    d = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(c)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(ids), (d ** 2).argmin(1))
    np.testing.assert_allclose(np.asarray(dists), (d ** 2).min(1),
                               rtol=1e-3, atol=1e-3)


def test_nearest_codeword_odd_shapes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(7, 5)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)
    ids, _ = nearest_codeword(x, c)
    ids2, _ = nearest_codeword_xla(x, c)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_rqvae_uses_kernel_path_consistently():
    """STE-mode quantize ids must match the XLA distance argmin."""
    from genrec_tpu.models.rqvae import Quantize, QuantizeForwardMode
    q = Quantize(embed_dim=8, n_embed=16,
                 forward_mode=QuantizeForwardMode.STE)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(32, 8)),
                    jnp.float32)
    params = q.init({"params": jax.random.PRNGKey(0)}, x, 0.2)["params"]
    out_train = q.apply({"params": params}, x, 0.2, train=True)
    out_eval = q.apply({"params": params}, x, 0.2, train=False)
    cb = np.asarray(params["embedding"])
    d = ((np.asarray(x)[:, None] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(out_train.ids), d.argmin(1))
    np.testing.assert_array_equal(np.asarray(out_eval.ids), d.argmin(1))


@pytest.fixture
def interpret_dropout():
    import genrec_tpu.kernels.dropout as fdrop
    fattn.INTERPRET = True
    fdrop.INTERPRET = True
    yield
    fattn.INTERPRET = False
    fdrop.INTERPRET = False


def test_fused_dropout_mask_properties(interpret_dropout):
    from genrec_tpu.kernels.dropout import fused_dropout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(37, 61, 384)), jnp.float32)
    y = fused_dropout(x, 5, 0.3)
    assert bool(jnp.all(y == fused_dropout(x, 5, 0.3)))       # reproducible
    assert not bool(jnp.all(y == fused_dropout(x, 6, 0.3)))   # seed matters
    frac = float((y == 0).mean())
    assert abs(frac - 0.3) < 0.01, frac                       # drop fraction
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(y)[kept],
                               np.asarray(x)[kept] / 0.7, rtol=1e-6)


def test_fused_dropout_backward_regenerates_identical_mask(interpret_dropout):
    """The core contract: the custom VJP's regenerated mask equals the
    forward's (counter-based hash, no HBM mask tensor)."""
    from genrec_tpu.kernels.dropout import fused_dropout
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 25, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    y = fused_dropout(x, 11, 0.4)
    g = jax.grad(lambda x: jnp.sum(fused_dropout(x, 11, 0.4) * w))(x)
    # dx = mask/keep * w — zero exactly where the forward dropped
    assert bool(jnp.all((np.asarray(g) == 0) == (np.asarray(y) == 0)))
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(g)[kept],
                               np.asarray(w)[kept] / 0.6, rtol=1e-5)


def test_fused_attention_dropout_fwd_bwd_mask_match(interpret_dropout):
    rng = np.random.default_rng(2)
    # Sq·Sk ≥ 1024 so the kernel path (not the small-matrix XLA shortcut)
    # is exercised
    q = jnp.asarray(rng.normal(size=(4, 32, 128)), jnp.float32)
    out1 = fattn.fused_attention(q, q, q, None, None, n_heads=4, seed=9,
                                 dropout_rate=0.5)
    out2 = fattn.fused_attention(q, q, q, None, None, n_heads=4, seed=9,
                                 dropout_rate=0.5)
    assert bool(jnp.all(out1 == out2))
    # out is linear in v with a fixed mask: finite difference == analytic
    gv = jax.grad(lambda v: jnp.sum(fattn.fused_attention(
        q, q, v, None, None, n_heads=4, seed=9, dropout_rate=0.5)))(q)
    eps = 1e-3
    v2 = q.at[0, 0, 0].add(eps)
    fd = (jnp.sum(fattn.fused_attention(q, q, v2, None, None, n_heads=4,
                                        seed=9, dropout_rate=0.5))
          - jnp.sum(fattn.fused_attention(q, q, q, None, None, n_heads=4,
                                          seed=9, dropout_rate=0.5))) / eps
    np.testing.assert_allclose(float(fd), float(gv[0, 0, 0]), rtol=2e-2)


def test_hwdropout_module_default_backend():
    """The module's default backend (pure-XLA hash dropout) drops ~rate and
    is a passthrough when deterministic."""
    from genrec_tpu.nn.dropout import Dropout, _backend
    assert _backend() == "hash"
    x = jnp.ones((4, 8))
    mod = Dropout(0.5)
    y = mod.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    assert float((np.asarray(y) == 0).mean()) > 0.2
    assert bool(jnp.all(mod.apply({}, x, deterministic=True) == x))


def test_hwdropout_module_plain_fallback(monkeypatch):
    """GENREC_TPU_NO_HASH_DROPOUT reverts to flax nn.Dropout."""
    from genrec_tpu.nn.dropout import Dropout, _backend
    monkeypatch.setenv("GENREC_TPU_NO_HASH_DROPOUT", "1")
    assert _backend() == "plain"
    x = jnp.ones((4, 8))
    y = Dropout(0.5).apply({}, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(0)})
    assert float((np.asarray(y) == 0).mean()) > 0.2


# ---------------------------------------------------------------------------
# pure-XLA hash dropout / hash softmax (the default TPU attention backend)
# ---------------------------------------------------------------------------


def test_hash_dropout_mask_properties():
    from genrec_tpu.kernels.dropout import hash_dropout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(37, 61, 384)), jnp.float32)
    y = hash_dropout(x, 5, 0.3)
    assert bool(jnp.all(y == hash_dropout(x, 5, 0.3)))       # reproducible
    assert not bool(jnp.all(y == hash_dropout(x, 6, 0.3)))   # seed matters
    frac = float((y == 0).mean())
    assert abs(frac - 0.3) < 0.01, frac                      # drop fraction
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(y)[kept],
                               np.asarray(x)[kept] / 0.7, rtol=1e-6)


def test_hash_dropout_backward_regenerates_identical_mask():
    from genrec_tpu.kernels.dropout import hash_dropout
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 25, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    y = hash_dropout(x, 11, 0.4)
    g = jax.grad(lambda x: jnp.sum(hash_dropout(x, 11, 0.4) * w))(x)
    assert bool(jnp.all((np.asarray(g) == 0) == (np.asarray(y) == 0)))
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(g)[kept],
                               np.asarray(w)[kept] / 0.6, rtol=1e-5)


def _hash_softmax_oracle(s, bias, kpad, scale):
    sf = s.astype(jnp.float32) * scale + bias[None] + kpad[:, None, None, :]
    return jax.nn.softmax(sf, axis=-1).astype(s.dtype)


def test_hash_softmax_matches_plain_softmax():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(4, 6, 13, 17)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(6, 13, 17)), jnp.float32)
    kpad = jnp.where(jnp.asarray(rng.random((4, 17)) < 0.2),
                     -1e9, 0.0).astype(jnp.float32)
    p = fattn._hash_softmax(s, bias, kpad, jnp.int32(0), 0.125, 0.0)
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(_hash_softmax_oracle(s, bias, kpad, 0.125)),
        rtol=1e-6, atol=1e-6)


def test_hash_softmax_recompute_backward_matches_autodiff():
    """The custom VJP (recompute from raw scores) must equal plain autodiff
    of the same chain at rate=0."""
    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.normal(size=(3, 2, 9, 11)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(2, 9, 11)), jnp.float32)
    kpad = jnp.zeros((3, 11), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 2, 9, 11)), jnp.float32)

    def loss_hash(s, bias):
        return jnp.sum(fattn._hash_softmax(s, bias, kpad, jnp.int32(0),
                                           0.3, 0.0) * w)

    def loss_oracle(s, bias):
        return jnp.sum(_hash_softmax_oracle(s, bias, kpad, 0.3) * w)

    gh = jax.grad(loss_hash, argnums=(0, 1))(s, bias)
    go = jax.grad(loss_oracle, argnums=(0, 1))(s, bias)
    for a, b, name in zip(gh, go, ["ds", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_hash_softmax_dropout_fwd_bwd_mask_match():
    """out = sum(p·w) is linear in w given a fixed mask: the analytic grad
    (regenerated mask) must equal the forward's dropped pattern."""
    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.normal(size=(2, 3, 8, 16)), jnp.float32)
    bias = jnp.zeros((3, 8, 16), jnp.float32)
    kpad = jnp.zeros((2, 16), jnp.float32)
    p1 = fattn._hash_softmax(s, bias, kpad, jnp.int32(9), 0.25, 0.5)
    p2 = fattn._hash_softmax(s, bias, kpad, jnp.int32(9), 0.25, 0.5)
    assert bool(jnp.all(p1 == p2))
    assert float((np.asarray(p1) == 0).mean()) > 0.3
    # downstream weighting: d(sum(p·w))/dw = p — and p's zeros come from the
    # forward mask, so the backward (which regenerates the mask for dL/ds)
    # must produce ds that is zero wherever an entire row was dropped
    w = jnp.asarray(rng.normal(size=s.shape), jnp.float32)
    g = jax.grad(lambda s: jnp.sum(
        fattn._hash_softmax(s, bias, kpad, jnp.int32(9), 0.25, 0.5) * w))(s)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check through the VJP on one coordinate
    eps, i = 1e-3, (0, 0, 0, 0)

    def f(sv):
        return float(jnp.sum(fattn._hash_softmax(
            sv, bias, kpad, jnp.int32(9), 0.25, 0.5) * w))

    fd = (f(s.at[i].add(eps)) - f(s.at[i].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(fd, float(g[i]), rtol=5e-2, atol=1e-4)


def test_fused_softmax_entry_dispatches_to_hash_off_interpreter():
    """Without INTERPRET/env, the public entry must take the pure-XLA hash
    path (usable on any backend) — the pallas kernel is opt-in."""
    assert fattn._attention_backend() == "xla_hash"
    rng = np.random.default_rng(6)
    s = jnp.asarray(rng.normal(size=(2, 2, 4, 300)), jnp.float32)
    bias = jnp.zeros((2, 4, 300), jnp.float32)
    kpad = jnp.zeros((2, 300), jnp.float32)
    p = fattn.fused_softmax(s, bias, kpad, 0, 0.5)
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(_hash_softmax_oracle(s, bias, kpad, 0.5)),
        rtol=1e-6, atol=1e-6)
