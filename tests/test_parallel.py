"""Multi-device tests over the 8-virtual-CPU-device mesh: sharding rules,
sharded top-k, and DP-vs-single-device equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.ops.topk import full_topk, sharded_topk
from genrec_tpu.parallel import make_mesh, shard_batch
from genrec_tpu.parallel.sharding import apply_shardings, param_shardings

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == jax.device_count()
    mesh2 = make_mesh(data=4, model=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_sharded_topk_matches_full():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(1024, 32)), jnp.float32)
    want_v, want_i = full_topk(hidden, table, 10)
    got_v, got_i = sharded_topk(mesh, hidden, table, 10)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_param_shardings_rules():
    mesh = make_mesh(data=4, model=2)
    params = {
        "item_embedding": jnp.zeros((2048, 64)),
        "blocks": {"dense": {"kernel": jnp.zeros((64, 64))}},
        "small_embedding": jnp.zeros((10, 64)),
    }
    sh = param_shardings(mesh, params, min_rows=1024)
    assert sh["item_embedding"].spec == jax.sharding.PartitionSpec("model")
    assert sh["blocks"]["dense"]["kernel"].spec == \
        jax.sharding.PartitionSpec()
    assert sh["small_embedding"].spec == jax.sharding.PartitionSpec()
    placed = apply_shardings(params, sh)
    assert placed["item_embedding"].sharding.spec == \
        jax.sharding.PartitionSpec("model")


def test_data_parallel_step_equals_single_device():
    """The same SASRec batch must give identical loss on a 1-device and an
    8-device data-parallel mesh (SPMD correctness)."""
    import optax
    from genrec_tpu.core.train_state import TrainState, apply_updates
    from genrec_tpu.models.sasrec import SASRec

    model = SASRec(num_items=100, max_seq_len=8, embed_dim=16, num_heads=2,
                   num_blocks=1, ffn_dim=32, dropout=0.0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (16, 8)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, 100, (16, 8)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    tx = optax.adam(1e-2)

    def step(state, ids, tgt):
        def lf(p):
            return model.apply({"params": p}, ids, targets=tgt).loss
        loss, grads = jax.value_and_grad(lf)(state.params)
        return apply_updates(state, grads, tx), loss

    losses = {}
    for name, mesh in [("single", make_mesh(data=1, model=1,
                                            devices=jax.devices()[:1])),
                       ("dp8", make_mesh(data=8, model=1))]:
        state = jax.device_put(
            TrainState.create(params, tx),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        batch = shard_batch({"ids": ids, "tgt": tgt}, mesh)
        with mesh:
            stepped = jax.jit(step)
            seq = []
            s = state
            for _ in range(3):
                s, loss = stepped(s, batch["ids"], batch["tgt"])
                seq.append(float(np.asarray(loss)))
        losses[name] = seq
    np.testing.assert_allclose(losses["single"], losses["dp8"], rtol=1e-5)


def test_model_sharded_tiger_step_runs():
    """Full TIGER step with (data=4, model=2) shardings compiles + runs."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sasrec_sharded_catalog_eval_matches_dense():
    """last_hidden + sharded_topk == full-logits top-k (the sharded
    full-catalog eval path for large vocabularies)."""
    from genrec_tpu.models.sasrec import SASRec, predict_topk

    model = SASRec(num_items=1023, max_seq_len=8, embed_dim=16, num_heads=2,
                   num_blocks=1, ffn_dim=32, dropout=0.0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1024, (8, 8)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]

    out = model.apply({"params": params}, ids)
    dense_top = predict_topk(out.logits[:, -1, :], 10)

    hidden = model.apply({"params": params}, ids,
                         method=SASRec.last_hidden)
    table = jnp.asarray(params["item_embedding"]).at[0].set(0.0)
    mesh = make_mesh(data=4, model=2)
    # mask pad id by scoring then dropping id 0 like predict_topk does:
    # score against the table with pad row zeroed, ask for k+1 and drop 0s
    vals, idx = sharded_topk(mesh, hidden, table, 11)
    filtered = []
    for row in np.asarray(idx):
        filtered.append([i for i in row if i != 0][:10])
    np.testing.assert_array_equal(np.asarray(filtered),
                                  np.asarray(dense_top))


def test_fsdp_llm_train_matches_replicated():
    """ZeRO-3 placement: large params shard over the data axis; 2 fsdp
    train steps match the replicated engine (full FT incl. fused CE)."""
    import optax

    from genrec_tpu.core.engine import Engine
    from genrec_tpu.models.llm import CausalLM
    from genrec_tpu.parallel.sharding import fsdp_shardings

    mesh = make_mesh(data=8, model=1)
    # dims chosen so wte (1024x64) and the MLP projections cross the
    # engine's default fsdp min_size (2**16) while staying CPU-fast
    model = CausalLM(vocab_size=1024, d_model=64, n_layers=2, n_heads=4,
                     n_kv_heads=2, ff_dim=1024, max_len=16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1024, (16, 12)), jnp.int32)
    labels = jnp.asarray(ids).at[:, :5].set(-100)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]

    sh = fsdp_shardings(mesh, params)
    specs = {tuple(p.key for p in path): s.spec
             for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]}
    assert specs[("wte",)] == jax.sharding.PartitionSpec("data", None)
    sharded_leaves = [s for s in specs.values() if s !=
                      jax.sharding.PartitionSpec()]
    assert len(sharded_leaves) >= 5   # wte + block projections

    def loss_fn(p, batch, rng):
        del rng
        out = model.apply({"params": p}, batch["ids"],
                          labels=batch["labels"])
        return out.loss, {}

    batch = {"ids": ids, "labels": labels}
    losses = {}
    for mode in ("fsdp", False):
        tx = optax.adamw(1e-3)
        own = jax.tree_util.tree_map(jnp.array, params)  # donation-safe
        eng = Engine(mesh, loss_fn, tx, own, shard_params=mode,
                     rng=jax.random.PRNGKey(1))
        if mode == "fsdp":
            wte = eng.state.params["wte"]
            assert wte.sharding.spec == jax.sharding.PartitionSpec("data", None)
        ms = [eng.run_step(batch) for _ in range(2)]
        losses[mode] = [float(np.asarray(m["loss"])) for m in ms]
    np.testing.assert_allclose(losses["fsdp"], losses[False], rtol=2e-5)


def test_vocab_parallel_ce_matches_unsharded():
    """Megatron-style vocab-parallel CE on a (data=4, model=2) mesh: loss
    and grads match the single-device fused op; the table never moves."""
    from genrec_tpu.ops.fused_ce import (fused_linear_cross_entropy,
                                         make_vocab_parallel_ce)

    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(5)
    N, D, V = 16, 32, 250   # V % model-axis != 0: pad path
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(V, D)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    labels = labels.at[:3].set(-100)

    sharded = make_vocab_parallel_ce(mesh, chunk=64)
    ref = lambda x, w: fused_linear_cross_entropy(x, w, labels, -100, 64,
                                                  True)

    ls = jax.jit(sharded)(x, w, labels)
    lr = jax.jit(ref)(x, w)
    np.testing.assert_allclose(float(ls), float(lr), rtol=1e-6)

    gs = jax.grad(lambda a, b: sharded(a, b, labels), argnums=(0, 1))(x, w)
    gr = jax.grad(ref, argnums=(0, 1))(x, w)
    for a, b, name in zip(gs, gr, ("dx", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-6, err_msg=name)


def test_fsdp_with_lora_split():
    """ZeRO-3 frozen base + replicated LoRA adapters: the multi-chip LoRA
    combination. The fsdp min-size rule leaves adapters replicated; only
    they get grads/optimizer state, and training matches the
    single-device split engine."""
    import optax

    from genrec_tpu.core.engine import Engine
    from genrec_tpu.models.llm import CausalLM, lora_param_mask

    model = CausalLM(vocab_size=1024, d_model=64, n_layers=2, n_heads=4,
                     n_kv_heads=2, ff_dim=1024, max_len=16, lora_rank=4)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 1024, (16, 12)), jnp.int32)
    labels = jnp.asarray(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    mask = lora_param_mask(params)

    def loss_fn(p, batch, rng):
        return model.apply({"params": p}, batch["ids"],
                           labels=batch["labels"]).loss, {}

    batch = {"ids": ids, "labels": labels}
    losses = {}
    for name, mesh, mode in (
            ("fsdp", make_mesh(data=8, model=1), "fsdp"),
            ("rep", make_mesh(data=1, model=1,
                              devices=jax.devices()[:1]), False)):
        own = jax.tree_util.tree_map(jnp.array, params)
        eng = Engine(mesh, loss_fn, optax.adamw(1e-3), own,
                     shard_params=mode, trainable_mask=mask,
                     rng=jax.random.PRNGKey(2))
        if name == "fsdp":
            wte = eng.frozen["wte"]
            assert wte.sharding.spec == jax.sharding.PartitionSpec(
                "data", None)
            assert all("lora" in k for k in eng.state.params)
        losses[name] = [float(np.asarray(eng.run_step(batch)["loss"]))
                        for _ in range(2)]
    np.testing.assert_allclose(losses["fsdp"], losses["rep"], rtol=2e-5)


def test_sharded_predict_topk_matches_dense():
    """Trainer eval path under TP: exact match with predict_topk, incl.
    pad-row exclusion and a catalog not divisible by the model axis."""
    from genrec_tpu.models.sasrec import predict_topk
    from genrec_tpu.trainers.sasrec_trainer import sharded_predict_topk

    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(9)
    B, D, V = 8, 16, 101          # V odd: pad path
    hidden = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    table = table.at[0].set(0.0)  # pinned pad row

    logits = hidden @ table.T
    dense = predict_topk(logits, 10)
    with mesh:
        shd = jax.jit(lambda h, t: sharded_predict_topk(mesh, h, t, 10))(
            hidden, table)
    np.testing.assert_array_equal(np.asarray(shd), np.asarray(dense))
