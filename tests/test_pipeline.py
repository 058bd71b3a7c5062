"""Pipeline parallelism: GPipe schedule == plain layer stack, loss+grads.

The reference has no PP (SURVEY §2.5); these tests pin the TPU-native tier:
stacked-layer param layout round-trips, and the shard_map GPipe executor
reproduces the unpipelined CausalLM loss and gradients bitwise-closely on a
(data=2, pipe=4) virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.models.llm import CausalLM
from genrec_tpu.parallel.pipeline import (PipelinedLM, from_pipeline_params,
                                          make_pipeline_mesh,
                                          pipeline_param_shardings,
                                          to_pipeline_params)


def _model(**kw):
    kw.setdefault("vocab_size", 256)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_layers", 4)
    kw.setdefault("n_heads", 4)
    kw.setdefault("n_kv_heads", 2)
    kw.setdefault("ff_dim", 64)
    kw.setdefault("max_len", 16)
    return CausalLM(**kw)


def _batch(B=8, L=12, vocab=256, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, vocab, (B, L)), jnp.int32)
    mask = np.ones((B, L), np.int32)
    # left-pad two rows to exercise the position/bias plumbing
    mask[0, :3] = 0
    mask[3, :5] = 0
    labels = np.asarray(ids).copy()
    labels[mask == 0] = -100
    labels[:, :2] = -100  # prompt masking
    return ids, jnp.asarray(mask), jnp.asarray(labels)


def test_param_layout_roundtrip():
    model = _model()
    ids, mask, labels = _batch()
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    pp = to_pipeline_params(params, model.n_layers)
    assert set(pp) == {"layers", "rest"}
    stacked = jax.tree_util.tree_leaves(pp["layers"])
    assert all(leaf.shape[0] == model.n_layers for leaf in stacked)
    back = from_pipeline_params(pp)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, back)


@pytest.mark.parametrize("data,pipe,n_micro", [(2, 4, 4), (1, 8, 2)])
def test_pipelined_loss_and_grads_match(data, pipe, n_micro):
    if len(jax.devices()) < data * pipe:
        pytest.skip("needs 8 virtual devices")
    model = _model(n_layers=8 if pipe == 8 else 4)
    ids, mask, labels = _batch(B=8)
    params = model.init({"params": jax.random.PRNGKey(1)}, ids)["params"]

    def plain_loss(p):
        return model.apply({"params": p}, ids, attention_mask=mask,
                           labels=labels).loss

    ref_loss, ref_grads = jax.value_and_grad(plain_loss)(params)

    mesh = make_pipeline_mesh(data=data, pipe=pipe,
                              devices=jax.devices()[:data * pipe])
    plm = PipelinedLM(model, mesh, n_micro=n_micro)
    pp = to_pipeline_params(params, model.n_layers)
    pp = jax.tree_util.tree_map(
        jax.device_put, pp, pipeline_param_shardings(mesh, pp))

    def pipe_loss(p):
        return plm.loss(p, ids, mask, labels)

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(pipe_loss))(pp)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)

    flat_ref = from_pipeline_params(
        jax.tree_util.tree_map(np.asarray, grads))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6),
        flat_ref, ref_grads)


def test_pipelined_train_step_runs_sharded():
    """One optimizer step on a (2, 4) mesh with pipe-sharded layer params —
    the dryrun-style smoke that PP composes with the optimizer."""
    import optax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = _model()
    ids, mask, labels = _batch(B=8)
    mesh = make_pipeline_mesh(data=2, pipe=4, devices=jax.devices()[:8])
    plm = PipelinedLM(model, mesh, n_micro=2)
    pp = plm.init_params(jax.random.PRNGKey(0), ids)
    pp = jax.tree_util.tree_map(
        jax.device_put, pp, pipeline_param_shardings(mesh, pp))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(pp)

    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: plm.loss(q, ids, mask, labels))(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        p1, s1, l1 = jax.jit(step)(pp, opt_state)
        p2, _, l2 = jax.jit(step)(p1, s1)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)
    # layer params stay pipe-sharded through the step
    leaf = jax.tree_util.tree_leaves(p1["layers"])[0]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec("pipe")


def test_lcrec_trainer_pipeline_parallel_e2e(tmp_path):
    """The user surface reaches PP: train.pipeline_parallelism=4 runs the
    full SFT loop (GPipe engine) + constrained eval on 8 virtual devices."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.lcrec_trainer import train
    rng = np.random.default_rng(0)
    sem_ids = rng.integers(0, 64, (2000, 3))
    gin.parse_config("""
        train.epochs = 1
        train.batch_size = 8
        train.max_len = 96
        train.d_model = 64
        train.n_layers = 4
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
        train.pipeline_parallelism = 4
        train.pp_microbatches = 2
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    gin.bind_parameter("train.sem_ids_table", sem_ids)
    m = train()
    assert "Recall@10" in m


def test_lcrec_trainer_pipeline_parallel_lora(tmp_path):
    """PP composes with the LoRA trainable/frozen split: adapters train on
    the stacked layout, base weights stay frozen."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.lcrec_trainer import train
    rng = np.random.default_rng(0)
    sem_ids = rng.integers(0, 64, (2000, 3))
    gin.parse_config("""
        train.epochs = 1
        train.batch_size = 8
        train.max_len = 96
        train.d_model = 64
        train.n_layers = 4
        train.n_heads = 4
        train.n_kv_heads = 2
        train.ff_dim = 128
        train.base_vocab = 2000
        train.num_codebooks = 3
        train.codebook_size = 64
        train.dataset_type = "synthetic"
        train.max_seq_len = 6
        train.num_beams = 4
        train.max_train_samples = 16
        train.max_eval_samples = 8
        train.pipeline_parallelism = 4
        train.pp_microbatches = 2
        train.use_lora = True
        train.lora_rank = 4
        train.do_eval = False
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    gin.bind_parameter("train.sem_ids_table", sem_ids)
    m = train()
    assert "Recall@10" in m


def test_pipelined_remat_matches():
    """model.remat routes through jax.checkpoint in the GPipe body without
    changing the loss."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ids, mask, labels = _batch(B=8)
    mesh = make_pipeline_mesh(data=2, pipe=4, devices=jax.devices()[:8])
    losses = []
    for remat in (False, True):
        model = _model(remat=remat)
        params = model.init({"params": jax.random.PRNGKey(3)},
                            ids)["params"]
        plm = PipelinedLM(model, mesh, n_micro=2)
        pp = to_pipeline_params(params, model.n_layers)
        with mesh:
            loss, _ = jax.jit(jax.value_and_grad(
                lambda p: plm.loss(p, ids, mask, labels)))(pp)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
