"""HSTU trainer: same skeleton as SASRec + per-event timestamps.

Parity target: ``/root/reference/genrec/trainers/hstu_trainer.py`` (:39-83
eval with timestamps, :86-209 train loop with ``use_temporal_bias`` flag).

Run: ``python -m genrec_tpu.trainers.hstu_trainer config/hstu/amazon.gin
--split beauty``
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configlib import gin, parse_config
from genrec_tpu.core import (CheckpointManager, Engine, MetricLogger,
                             StepTimer, make_optimizer, make_schedule,
                             setup_logger)
from genrec_tpu.data import Loader, sasrec_eval_batch, sasrec_train_batch
from genrec_tpu.models.hstu import HSTU
from genrec_tpu.models.sasrec import predict_topk
from genrec_tpu.ops import topk_metric_sums
from genrec_tpu.parallel import make_mesh
from genrec_tpu.trainers.sasrec_trainer import _load_corpus

EVAL_KS = (1, 5, 10)


from genrec_tpu.trainers.sasrec_trainer import evaluate  # shared eval loop


@gin.configurable
def train(epochs: int = 10, batch_size: int = 128,
          learning_rate: float = 1e-3, weight_decay: float = 0.0,
          max_seq_len: int = 50, embed_dim: int = 64, num_heads: int = 2,
          num_blocks: int = 2, dropout: float = 0.2,
          num_position_buckets: int = 32, num_time_buckets: int = 64,
          max_position_distance: int = 128, use_temporal_bias: bool = True,
          dataset_folder: str = "dataset/amazon", split: str = "beauty",
          dataset_type: str = "amazon",
          do_eval: bool = True, eval_every_epoch: int = 1,
          eval_batch_size: int = 256,
          save_dir_root: str = "out/hstu", save_every_epoch: int = 50,
          wandb_logging: bool = False, wandb_project: str = "",
          wandb_log_interval: int = 100,
          amp: bool = True, mixed_precision_type: str = "bf16",
          seed: int = 42, fast_rng: bool = True, shard_params: bool = False,
          model_parallelism: int = 1, sequence_parallelism: bool = False,
          resume_from_checkpoint: bool = False, max_steps_per_epoch: int = 0,
          steps_per_dispatch: int = 16, **unused) -> dict:
    logger = setup_logger("hstu", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    mesh = make_mesh(model=model_parallelism)
    if sequence_parallelism:
        # ring SiLU attention: activations shard (batch, sequence) over
        # (data, model) — the long-history path (parallel/ring.py). The
        # catalog stays replicated (the model axis is spent on sequence).
        if model_parallelism <= 1:
            raise ValueError("sequence_parallelism shards the sequence "
                             "over the model axis: set model_parallelism>1")
        if shard_params:
            raise ValueError("sequence_parallelism and shard_params both "
                             "use the model axis — pick one")

    corpus = _load_corpus(dataset_type, dataset_folder, split)
    num_items = corpus.num_items
    logger.info("corpus: %d users, %d items", len(corpus.sequences), num_items)

    pidx, pcnt = jax.process_index(), jax.process_count()
    train_loader = Loader(
        corpus.generate_samples("train"), batch_size,
        partial(sasrec_train_batch, max_seq_len=max_seq_len, with_time=True),
        shuffle=True, seed=seed, process_index=pidx, process_count=pcnt)
    mk_eval = lambda s: Loader(
        corpus.generate_samples(s), eval_batch_size,
        partial(sasrec_eval_batch, max_seq_len=max_seq_len, with_time=True),
        shuffle=False, process_index=pidx, process_count=pcnt)
    valid_loader, test_loader = mk_eval("valid"), mk_eval("test")

    dtype = jnp.bfloat16 if (amp and mixed_precision_type == "bf16") \
        else jnp.float32
    attn_impl = None
    if sequence_parallelism:
        from genrec_tpu.parallel.ring import make_ring_silu_attention
        attn_impl = make_ring_silu_attention(mesh)
    model = HSTU(num_items=num_items, max_seq_len=max_seq_len,
                 embed_dim=embed_dim, num_heads=num_heads,
                 num_blocks=num_blocks, dropout=dropout,
                 num_position_buckets=num_position_buckets,
                 num_time_buckets=num_time_buckets,
                 max_position_distance=max_position_distance,
                 use_temporal_bias=use_temporal_bias, dtype=dtype,
                 attn_impl=attn_impl)

    rng = jax.random.PRNGKey(seed)
    sample = next(iter(train_loader))
    params = model.init({"params": rng}, jnp.asarray(sample.ids),
                        timestamps=jnp.asarray(sample.x))["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    schedule = make_schedule(name="constant", learning_rate=learning_rate)
    tx = make_optimizer(schedule, optimizer="adam", b1=0.9, b2=0.98,
                        weight_decay=weight_decay, grad_clip_norm=None)

    if shard_params and mesh.shape["model"] > 1:
        # keep the row-sharded catalog sharded through the loss
        # (see sasrec_trainer.py / ops/fused_ce.py)
        from genrec_tpu.ops.fused_ce import make_vocab_parallel_ce
        vp_ce = make_vocab_parallel_ce(mesh, ignore_index=0)
        logger.info("using vocab-parallel CE over the model axis")

        def loss_fn(params, batch, rng):
            x, item_emb = model.apply(
                {"params": params}, batch.ids, timestamps=batch.x,
                deterministic=False, rngs={"dropout": rng},
                return_hidden=True)
            loss = vp_ce(x.reshape(-1, x.shape[-1]), item_emb,
                         batch.ids_fut.reshape(-1))
            return loss, {}
    else:
        def loss_fn(params, batch, rng):
            out = model.apply({"params": params}, batch.ids,
                              timestamps=batch.x, targets=batch.ids_fut,
                              deterministic=False, rngs={"dropout": rng})
            return out.loss, {}

    if shard_params and mesh.shape["model"] > 1:
        from genrec_tpu.trainers.sasrec_trainer import sharded_predict_topk

        @jax.jit
        def eval_step(params, batch):
            x, item_emb = model.apply({"params": params}, batch.ids,
                                      timestamps=batch.x,
                                      deterministic=True,
                                      return_hidden=True)
            topk = sharded_predict_topk(mesh, x[:, -1, :], item_emb,
                                        max(EVAL_KS))
            return topk_metric_sums(batch.ids_fut[:, None],
                                    topk[:, :, None], EVAL_KS,
                                    valid=batch.valid)
    else:
        @jax.jit
        def eval_step(params, batch):
            out = model.apply({"params": params}, batch.ids,
                              timestamps=batch.x, deterministic=True)
            topk = predict_topk(out.logits[:, -1, :], max(EVAL_KS))
            return topk_metric_sums(batch.ids_fut[:, None], topk[:, :, None],
                                    EVAL_KS, valid=batch.valid)

    shard_batch_fn = None
    if sequence_parallelism:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sp2 = NamedSharding(mesh, P("data", "model"))
        sp1 = NamedSharding(mesh, P("data"))

        def shard_batch_fn(batch):
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(np.asarray(a),
                                         sp2 if np.ndim(a) == 2 else sp1),
                batch)

    engine = Engine(mesh, loss_fn, tx, params, rng=rng,
                    shard_params=shard_params,
                    shard_batch_fn=shard_batch_fn)
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=pidx == 0)
    ckpt = CheckpointManager(os.path.join(save_dir_root, "ckpt"))
    if resume_from_checkpoint and engine.restore(ckpt):
        logger.info("resumed from step %d", engine.step)

    best_recall10, best_params = -1.0, None
    from genrec_tpu.core.preemption import PreemptionGuard
    guard = PreemptionGuard()
    timer = StepTimer()
    from genrec_tpu.core.engine import fused_epoch_steps
    for epoch in range(epochs):
        for n, metrics in fused_epoch_steps(
                engine, train_loader, steps_per_dispatch,
                max_steps=max_steps_per_epoch,
                intervals=(wandb_log_interval,)):
            timer.tick(n * batch_size)
            if guard.should_stop():
                logger.warning("preemption signal: checkpointing at step %d and exiting", engine.step)
                engine.save(ckpt, config=gin.operative_config())
                return {"preempted_at_step": engine.step}
            if engine.step % wandb_log_interval == 0:
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                host["examples_per_sec"] = timer.examples_per_sec
                mlogger.log(host, engine.step)
        logger.info("epoch %d: loss=%.4f (%.0f ex/s)", epoch,
                    float(np.asarray(metrics["loss"])),
                    timer.examples_per_sec)
        if do_eval and (epoch + 1) % eval_every_epoch == 0:
            m = evaluate(model, engine.state.params, valid_loader, mesh,
                         eval_step)
            mlogger.log(m, engine.step, section="eval")
            logger.info("epoch %d valid: %s", epoch,
                        {k: round(v, 4) for k, v in m.items()})
            if m["Recall@10"] > best_recall10:
                best_recall10 = m["Recall@10"]
                best_params = jax.tree_util.tree_map(np.asarray,
                                                     engine.state.params)
        if (epoch + 1) % save_every_epoch == 0:
            engine.save(ckpt, config=gin.operative_config())

    final_params = best_params if best_params is not None \
        else engine.state.params
    test_metrics = evaluate(model, final_params, test_loader, mesh, eval_step)
    logger.info("test: %s", {k: round(v, 4) for k, v in test_metrics.items()})
    mlogger.log(test_metrics, engine.step, section="test")
    best_ckpt = CheckpointManager(os.path.join(save_dir_root, "best"))
    best_ckpt.save(engine.step, jax.tree_util.tree_map(np.asarray,
                                                       final_params),
                   config=gin.operative_config())
    mlogger.close()
    return test_metrics


if __name__ == "__main__":
    parse_config()
    train()
