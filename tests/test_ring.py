"""Ring attention / sequence parallelism == dense attention, loss+grads.

Pins the TPU-native SP tier (reference has none, SURVEY §2.5): the
ppermute ring with online softmax reproduces dense causal attention
exactly, and the SequenceParallelLM executor matches the unsharded
CausalLM loss and grads on a (data=2, model=4) virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.models.llm import CausalLM
from genrec_tpu.parallel.mesh import make_mesh
from genrec_tpu.parallel.ring import (NEG_INF, SequenceParallelLM,
                                      ring_attention)


def _dense_attention(q, k, v, kpad, causal=True):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + kpad[:, None, None, :]
    if causal:
        L = q.shape[2]
        s = s + jnp.triu(jnp.full((L, L), NEG_INF, jnp.float32), k=1)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", a,
                      v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_dense(causal):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    rng = np.random.default_rng(0)
    B, H, L, Dh = 4, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)
    kpad = np.zeros((B, L), np.float32)
    kpad[0, :3] = NEG_INF  # left padding
    kpad = jnp.asarray(kpad)

    ref = _dense_attention(q, k, v, kpad, causal)
    with mesh:
        out = jax.jit(lambda *a: ring_attention(
            *a, mesh=mesh, causal=causal))(q, k, v, kpad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_attention_grads_match_dense():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    rng = np.random.default_rng(1)
    B, H, L, Dh = 2, 2, 8, 4
    q = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)
    kpad = jnp.zeros((B, L), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, H, L, Dh)), jnp.float32)

    ref_g = jax.grad(lambda q, k, v: jnp.sum(
        _dense_attention(q, k, v, kpad) * w), argnums=(0, 1, 2))(q, k, v)
    with mesh:
        g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            ring_attention(q, k, v, kpad, mesh=mesh) * w),
            argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_sequence_parallel_lm_matches_plain(remat):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = CausalLM(vocab_size=256, d_model=32, n_layers=2, n_heads=4,
                     n_kv_heads=2, ff_dim=64, max_len=32, remat=remat)
    rng = np.random.default_rng(2)
    B, L = 4, 16
    ids = jnp.asarray(rng.integers(1, 256, (B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    mask[0, :4] = 0
    mask = jnp.asarray(mask)
    labels = np.asarray(ids).copy()
    labels[np.asarray(mask) == 0] = -100
    labels = jnp.asarray(labels)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]

    def plain(p):
        return model.apply({"params": p}, ids, attention_mask=mask,
                           labels=labels).loss

    ref_loss, ref_grads = jax.value_and_grad(plain)(params)

    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    splm = SequenceParallelLM(model, mesh)
    s_ids, s_mask, s_labels = splm.shard_inputs(ids, mask, labels)
    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(
            lambda p: splm.loss(p, s_ids, s_mask, s_labels)))(params)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        grads, ref_grads)


def test_lcrec_trainer_sequence_parallel_e2e(tmp_path):
    """The user surface reaches SP: train.sequence_parallelism=True runs
    the SFT loop with ring attention on a (2, 4) virtual mesh."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.lcrec_trainer import train
    rng = np.random.default_rng(0)
    sem_ids = rng.integers(0, 64, (2000, 3))
    gin.parse_config("""
        train.epochs = 1
        train.batch_size = 8
        train.max_len = 96
        train.d_model = 64
        train.n_layers = 2
        train.n_heads = 4
        train.n_kv_heads = 2
        train.ff_dim = 128
        train.base_vocab = 2000
        train.num_codebooks = 3
        train.codebook_size = 64
        train.dataset_type = "synthetic"
        train.max_seq_len = 6
        train.num_beams = 4
        train.max_train_samples = 32
        train.max_eval_samples = 8
        train.model_parallelism = 4
        train.sequence_parallelism = True
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    gin.bind_parameter("train.sem_ids_table", sem_ids)
    m = train()
    assert "Recall@10" in m


def test_hstu_ring_attention_matches_dense():
    """Sequence-parallel HSTU (ring SiLU attention, per-step bias gathers)
    reproduces the dense model exactly — logits, loss and grads — on a
    (2, 4) virtual mesh, including temporal bias and padding rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from genrec_tpu.models.hstu import HSTU
    from genrec_tpu.parallel.ring import make_ring_silu_attention

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    B, L, V = 4, 16, 300
    ids = rng.integers(1, V + 1, (B, L)).astype(np.int32)
    ids[0, :5] = 0  # padding
    ts = np.sort(rng.integers(1_300_000_000, 1_400_000_000, (B, L)), axis=1)
    tgt = rng.integers(1, V + 1, (B, L)).astype(np.int32)
    kw = dict(num_items=V, max_seq_len=L, embed_dim=32, num_heads=2,
              num_blocks=2, dropout=0.0, use_temporal_bias=True,
              fused_ce=False)
    dense = HSTU(**kw)
    params = dense.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(ids),
                        timestamps=jnp.asarray(ts),
                        targets=jnp.asarray(tgt))["params"]
    ref = dense.apply({"params": params}, jnp.asarray(ids),
                      timestamps=jnp.asarray(ts), targets=jnp.asarray(tgt))
    ref_grads = jax.grad(lambda p: dense.apply(
        {"params": p}, jnp.asarray(ids), timestamps=jnp.asarray(ts),
        targets=jnp.asarray(tgt)).loss)(params)

    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    sp = HSTU(**kw, attn_impl=make_ring_silu_attention(mesh))
    shard = NamedSharding(mesh, P("data", "model"))
    s_ids = jax.device_put(ids, shard)
    s_ts = jax.device_put(ts.astype(np.int32), shard)
    s_tgt = jax.device_put(tgt, shard)
    with mesh:
        out = jax.jit(lambda p: sp.apply(
            {"params": p}, s_ids, timestamps=s_ts, targets=s_tgt))(params)
        grads = jax.jit(jax.grad(lambda p: sp.apply(
            {"params": p}, s_ids, timestamps=s_ts,
            targets=s_tgt).loss))(params)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        grads, ref_grads)


def test_hstu_ring_long_sequence_smoke():
    """L=512 with 4-way sequence sharding trains one step — the
    long-history regime where the dense (B, L, L, NB) temporal one-hot
    (64x quadratic) would dominate memory."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from genrec_tpu.models.hstu import HSTU
    from genrec_tpu.parallel.ring import make_ring_silu_attention
    import optax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(1)
    B, L, V = 4, 512, 1000
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    model = HSTU(num_items=V, max_seq_len=L, embed_dim=32, num_heads=2,
                 num_blocks=1, dropout=0.0, use_temporal_bias=True,
                 attn_impl=make_ring_silu_attention(mesh))
    ids = rng.integers(1, V + 1, (B, L)).astype(np.int32)
    ts = np.sort(rng.integers(1_300_000_000, 1_400_000_000, (B, L)), axis=1)
    tgt = rng.integers(1, V + 1, (B, L)).astype(np.int32)
    shard = NamedSharding(mesh, P("data", "model"))
    s_ids, s_ts, s_tgt = (jax.device_put(a, shard)
                          for a in (ids, ts.astype(np.int32), tgt))
    params = model.init({"params": jax.random.PRNGKey(0)}, s_ids,
                        timestamps=s_ts, targets=s_tgt)["params"]
    tx = optax.adam(1e-3)
    state = tx.init(params)
    with mesh:
        loss, g = jax.jit(jax.value_and_grad(lambda p: model.apply(
            {"params": p}, s_ids, timestamps=s_ts,
            targets=s_tgt).loss))(params)
        updates, state = tx.update(g, state, params)
    assert np.isfinite(float(loss))


def test_hstu_trainer_sequence_parallel_e2e(tmp_path):
    """The user surface reaches HSTU SP: train.sequence_parallelism=True
    runs the full loop (ring SiLU attention) on a (2, 4) virtual mesh."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.hstu_trainer import train
    gin.parse_config("""
        train.epochs = 1
        train.batch_size = 16
        train.max_seq_len = 16
        train.embed_dim = 32
        train.num_heads = 2
        train.num_blocks = 1
        train.dataset_type = "synthetic"
        train.eval_batch_size = 32
        train.model_parallelism = 4
        train.sequence_parallelism = True
        train.max_steps_per_epoch = 3
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    m = train()
    assert "Recall@10" in m
