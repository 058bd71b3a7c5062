"""Worker process for the multi-process execution test (run by
tests/test_multihost.py as 2 processes x 4 virtual CPU devices each).

Exercises the full multi-host stack end-to-end (VERDICT r2 weak #7: this
path had never executed ``jax.distributed.initialize``):
  - coordinator bootstrap via parallel.multihost.maybe_initialize_distributed
  - a global (data=8) mesh spanning both processes
  - process-sharded Loader (each process loads its half of the batch)
  - Engine train steps (grad psum across processes through sharded autodiff)
  - psum-reduced eval metric sums identical on both processes
  - sharded orbax save + restore (collective write, per-shard files)
  - host_barrier
Prints "MULTIHOST OK <pid>" on success; any assertion kills the exit code.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from genrec_tpu.parallel.multihost import (host_barrier,
                                               maybe_initialize_distributed)

    maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    pid = jax.process_index()

    import jax.numpy as jnp
    import optax
    from genrec_tpu.core.checkpoint import CheckpointManager
    from genrec_tpu.core.engine import Engine
    from genrec_tpu.data.loader import Loader
    from genrec_tpu.data.batching import sasrec_train_batch
    from genrec_tpu.data.synthetic import make_catalog, make_interactions
    from genrec_tpu.models.sasrec import SASRec
    from genrec_tpu.ops.metrics import topk_metric_sums
    from genrec_tpu.parallel.mesh import make_mesh, shard_batch
    from functools import partial

    catalog = make_catalog(n_items=200, emb_dim=16, n_clusters=8, seed=0)
    corpus = make_interactions(catalog, n_users=64, min_len=5, max_len=10,
                               seed=1)
    samples = corpus.generate_samples("train")

    mesh = make_mesh()          # (data=8, model=1) across both processes
    model = SASRec(num_items=corpus.num_items, max_seq_len=10, embed_dim=16,
                   num_heads=2, num_blocks=1, ffn_dim=32, dropout=0.0)

    B = 16  # global; each process loads 8
    loader = Loader(samples, B, partial(sasrec_train_batch, max_seq_len=10),
                    shuffle=True, seed=0, process_index=pid, process_count=2)
    first = next(iter(loader))
    assert first.ids.shape[0] == B // 2, first.ids.shape

    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.asarray(first.ids),
                        targets=jnp.asarray(first.ids_fut),
                        deterministic=False)["params"]

    # host copy: the device params are donated by the Engine's train steps
    host_params = jax.tree_util.tree_map(np.asarray, params)

    def loss_fn(p, batch, step_rng):
        out = model.apply({"params": p}, batch.ids, targets=batch.ids_fut,
                          deterministic=True)
        return out.loss, {}

    tx = optax.adam(1e-3)
    engine = Engine(mesh, loss_fn, tx, params, rng=rng)
    losses = []
    for i, batch in enumerate(loader):
        if batch.ids.shape[0] != B // 2:
            break  # ragged tail
        m = engine.run_step(batch)
        losses.append(float(np.asarray(m["loss"])))
        if i >= 3:
            break
    assert len(losses) >= 3 and all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses  # it trains

    # eval metric sums: psum across the global batch inside jit — both
    # processes must see the identical reduced value
    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch.ids, deterministic=True)
        last = out.logits[:, -1, :]
        topk = jnp.argsort(-last, axis=-1)[:, :10]
        return topk_metric_sums(batch.ids_fut[:, -1:],
                                topk[:, :, None], (1, 5, 10))
    eb = shard_batch(first, mesh)
    sums = eval_step(engine.state.params, eb)
    count = float(np.asarray(sums["count"]))
    assert count == B, count  # global batch, not the local half

    # sharded orbax save + restore round-trip (collective write)
    ckpt_dir = os.environ["MULTIHOST_CKPT_DIR"]
    ckpt = CheckpointManager(ckpt_dir)
    engine.save(ckpt)
    host_barrier("after-save")
    step_before = engine.step
    engine2 = Engine(mesh, loss_fn, tx, host_params, rng=rng)
    assert engine2.restore(ckpt), "restore failed"
    assert engine2.step == step_before, (engine2.step, step_before)
    m = engine2.run_step(first)
    assert np.isfinite(float(np.asarray(m["loss"])))

    host_barrier("done")
    print(f"MULTIHOST OK {pid} losses={losses}", flush=True)


if __name__ == "__main__":
    main()
