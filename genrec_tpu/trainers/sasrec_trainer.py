"""SASRec trainer: gin-configured end-to-end training + full-catalog eval.

Parity target: ``/root/reference/genrec/trainers/sasrec_trainer.py`` —
Adam(0.9, 0.98) (:147), per-epoch train loop, eval computing
Recall/NDCG@{1,5,10} by full-vocab top-k on the last position (:39-84),
best-Recall@10 snapshot + final test with best weights (:180-206), file+console
logging (:20-36).

TPU-native redesign: the train step is one jit-compiled SPMD program over a
``Mesh`` (grad psum fused by XLA), eval is a jit-compiled metric-sum kernel
(the reference scores each row in a Python loop, :62-73), and metric
cross-host reduction happens on-device instead of ``accelerator.reduce``.

Run: ``python -m genrec_tpu.trainers.sasrec_trainer config/sasrec/amazon.gin
--split beauty [--gin "train.epochs=1"]``
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
from genrec_tpu.data import (Loader, sasrec_eval_batch, sasrec_train_batch,
                             synthetic_corpus)
from genrec_tpu.models.sasrec import SASRec, predict_topk
from genrec_tpu.ops import TopKAccumulator, topk_metric_sums
from genrec_tpu.parallel import make_mesh, shard_batch

EVAL_KS = (1, 5, 10)


def _load_corpus(dataset_type: str, dataset_folder: str, split: str,
                 min_seq_len: int = 5):
    if dataset_type == "synthetic":
        _, corpus = synthetic_corpus()
        return corpus
    if dataset_type == "p5":
        from genrec_tpu.data.p5_amazon import p5_corpus
        return p5_corpus(root=dataset_folder, split=split)
    if dataset_type != "amazon":
        raise ValueError(f"Unknown dataset_type: {dataset_type!r} "
                         f"(expected 'amazon' or 'synthetic')")
    from genrec_tpu.data.amazon import amazon_corpus
    return amazon_corpus(root=dataset_folder, split=split,
                         min_seq_len=min_seq_len)


def sharded_predict_topk(mesh, last_hidden, item_emb, k):
    """Top-k items from last-position hidden states with the catalog table
    row-sharded: per-shard scores + exact merge (ops.sharded_topk), then
    the pad row (id 0) and table-padding rows dropped — the sharded
    analogue of ``predict_topk(logits)`` without a (B, V) logits gather."""
    from genrec_tpu.ops.topk import sharded_topk
    m = mesh.shape["model"]
    V = item_emb.shape[0]
    pad = -V % m
    if pad:
        item_emb = jnp.pad(item_emb, ((0, pad), (0, 0)))
    _, idx = sharded_topk(mesh, last_hidden, item_emb, k + 1 + pad)
    keep = (idx != 0) & (idx < V)
    order = jnp.argsort(~keep, axis=1, stable=True)   # kept first, in order
    return jnp.take_along_axis(idx, order, axis=1)[:, :k]


def make_eval_fn(model: SASRec, mesh, sharded: bool = False):
    if sharded:
        @partial(jax.jit)
        def eval_step(params, batch):
            x, item_emb = model.apply({"params": params}, batch.ids,
                                      deterministic=True, method="hidden")
            topk = sharded_predict_topk(mesh, x[:, -1, :], item_emb,
                                        max(EVAL_KS))
            return topk_metric_sums(batch.ids_fut[:, None],
                                    topk[:, :, None], EVAL_KS,
                                    valid=batch.valid)
        return eval_step

    @partial(jax.jit)
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch.ids, deterministic=True)
        last = out.logits[:, -1, :]
        topk = predict_topk(last, max(EVAL_KS))
        return topk_metric_sums(batch.ids_fut[:, None], topk[:, :, None],
                                EVAL_KS, valid=batch.valid)
    return eval_step


def evaluate(model, params, loader, mesh, eval_step) -> dict:
    acc = TopKAccumulator(ks=EVAL_KS)
    for batch in loader:
        sums = eval_step(params, shard_batch(batch, mesh))
        acc.update_sums({k: float(np.asarray(v)) for k, v in sums.items()})
    return acc.reduce()


@gin.configurable
def train(epochs: int = 10, batch_size: int = 128,
          learning_rate: float = 1e-3, weight_decay: float = 0.0,
          max_seq_len: int = 50, embed_dim: int = 64, num_heads: int = 2,
          num_blocks: int = 2, ffn_dim: int = 256, dropout: float = 0.2,
          dataset_folder: str = "dataset/amazon", split: str = "beauty",
          dataset_type: str = "amazon",
          do_eval: bool = True, eval_every_epoch: int = 1,
          eval_batch_size: int = 256,
          save_dir_root: str = "out/sasrec", save_every_epoch: int = 50,
          wandb_logging: bool = False, wandb_project: str = "",
          wandb_log_interval: int = 100,
          amp: bool = True, mixed_precision_type: str = "bf16",
          seed: int = 42, fast_rng: bool = True, shard_params: bool = False,
          model_parallelism: int = 1,
          resume_from_checkpoint: bool = False, max_steps_per_epoch: int = 0,
          steps_per_dispatch: int = 32,
          **unused) -> dict:
    logger = setup_logger("sasrec", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    mesh = make_mesh(model=model_parallelism)
    logger.info("mesh: %s", mesh)

    corpus = _load_corpus(dataset_type, dataset_folder, split)
    num_items = corpus.num_items
    logger.info("corpus: %d users, %d items", len(corpus.sequences), num_items)

    train_samples = corpus.generate_samples("train")
    valid_samples = corpus.generate_samples("valid")
    test_samples = corpus.generate_samples("test")

    train_loader = Loader(
        train_samples, batch_size,
        partial(sasrec_train_batch, max_seq_len=max_seq_len),
        shuffle=True, seed=seed,
        process_index=jax.process_index(), process_count=jax.process_count())
    mk_eval_loader = lambda s: Loader(
        s, eval_batch_size, partial(sasrec_eval_batch, max_seq_len=max_seq_len),
        shuffle=False, process_index=jax.process_index(),
        process_count=jax.process_count())
    valid_loader, test_loader = map(mk_eval_loader,
                                    (valid_samples, test_samples))

    dtype = jnp.bfloat16 if (amp and mixed_precision_type == "bf16") \
        else jnp.float32
    model = SASRec(num_items=num_items, max_seq_len=max_seq_len,
                   embed_dim=embed_dim, num_heads=num_heads,
                   num_blocks=num_blocks, ffn_dim=ffn_dim, dropout=dropout,
                   dtype=dtype)

    rng = jax.random.PRNGKey(seed)
    sample = next(iter(train_loader))
    params = model.init({"params": rng, "dropout": rng},
                        jnp.asarray(sample.ids),
                        targets=jnp.asarray(sample.ids_fut),
                        deterministic=False)["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    steps_per_epoch = len(train_loader)
    schedule = make_schedule(name="constant", learning_rate=learning_rate)
    # reference uses Adam(0.9, 0.98) (sasrec_trainer.py:147)
    tx = make_optimizer(schedule, optimizer="adam", b1=0.9, b2=0.98,
                        weight_decay=weight_decay, grad_clip_norm=None)

    if shard_params and mesh.shape["model"] > 1:
        # with the catalog table row-sharded, the replicated fused CE
        # would all-gather it per chunk; the vocab-parallel variant keeps
        # it sharded through the loss (ops/fused_ce.py)
        from genrec_tpu.ops.fused_ce import make_vocab_parallel_ce
        vp_ce = make_vocab_parallel_ce(mesh, ignore_index=0)
        logger.info("using vocab-parallel CE over the model axis")

        def loss_fn(params, batch, rng):
            x, item_emb = model.apply(
                {"params": params}, batch.ids, deterministic=False,
                rngs={"dropout": rng}, method="hidden")
            loss = vp_ce(x.reshape(-1, x.shape[-1]), item_emb,
                         batch.ids_fut.reshape(-1))
            return loss, {}
    else:
        def loss_fn(params, batch, rng):
            out = model.apply({"params": params}, batch.ids,
                              targets=batch.ids_fut, deterministic=False,
                              rngs={"dropout": rng})
            return out.loss, {}

    engine = Engine(mesh, loss_fn, tx, params, rng=rng,
                    shard_params=shard_params)
    eval_step = make_eval_fn(
        model, mesh,
        sharded=bool(shard_params) and mesh.shape["model"] > 1)
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=jax.process_index() == 0)
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
