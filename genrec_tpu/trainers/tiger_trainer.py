"""TIGER trainer: encoder-decoder generative retrieval over semantic IDs.

Parity target: ``/root/reference/genrec/trainers/tiger_trainer.py`` —
``pad_collate`` with ``pad_id = num_item_embeddings*sem_id_dim`` (:27-80,167,
here :func:`genrec_tpu.data.batching.tiger_batch`), three loaders
(train/valid/test), AdamW + cosine warmup (:216-227), gradient accumulation
(:297-318, via ``optax.MultiSteps``), eval = ``model.generate`` with a trie
over ``valid_item_ids`` built from the dataset's code table (:241-245,
271-288), per-epoch valid / less-frequent test cadence (:337-350),
checkpoint/resume (:247-269).

The semantic-ID table comes from the RQ-VAE artifact
(``pretrained_rqvae_path``) — the cross-component contract; the reference
instead reconstructs the RQ-VAE and re-encodes every item at dataset-build
time (``data/amazon.py:296-313``).

Run: ``python -m genrec_tpu.trainers.tiger_trainer config/tiger/amazon/tiger.gin
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
                             StepTimer, load_rqvae_artifact, make_optimizer,
                             make_schedule, setup_logger)
from genrec_tpu.data import Loader, tiger_batch
from genrec_tpu.models.tiger import Tiger, build_trie, make_generate_fn
from genrec_tpu.ops import TopKAccumulator, topk_metric_sums
from genrec_tpu.parallel import make_mesh, shard_batch

EVAL_KS = (1, 5, 10)


def _load_corpus(dataset_type, dataset_folder, split):
    if dataset_type == "synthetic":
        from genrec_tpu.data.synthetic import synthetic_corpus
        _, corpus = synthetic_corpus()
        return corpus
    if dataset_type == "p5":
        from genrec_tpu.data.p5_amazon import p5_corpus
        return p5_corpus(root=dataset_folder, split=split)
    if dataset_type != "amazon":
        raise ValueError(f"Unknown dataset_type: {dataset_type!r}")
    from genrec_tpu.data.amazon import amazon_corpus
    return amazon_corpus(root=dataset_folder, split=split)


def evaluate(generate, params, loader, mesh, acc: TopKAccumulator,
             rng) -> dict:
    acc.reset()
    for batch in loader:
        db = shard_batch(batch, mesh)
        out = generate(params, db.user_ids, db.sem_ids, db.token_type_ids,
                       db.seq_mask, rng)
        sums = topk_metric_sums(db.sem_ids_fut, out.sem_ids, acc.ks,
                                valid=db.valid)
        acc.update_sums({k: float(np.asarray(v)) for k, v in sums.items()})
    return acc.reduce()


@gin.configurable
def train(epochs: int = 100, learning_rate: float = 1e-4,
          num_warmup_steps: int = 100, weight_decay: float = 0.035,
          batch_size: int = 256, gradient_accumulate_every: int = 1,
          embedding_dim: int = 128, attn_dim: int = 384, dropout: float = 0.1,
          num_heads: int = 6, n_layers: int = 8,
          num_item_embeddings: int = 256, num_user_embeddings: int = 10000,
          sem_id_dim: int = 3, max_seq_len: int = 20,
          dataset_type: str = "amazon", dataset_folder: str = "dataset/amazon",
          split: str = "beauty", subsample: bool = False,
          pretrained_rqvae_path: str = "",
          num_beams: int = 10, beam_temperature: float = 0.2,
          beam_sample: bool = False, use_trie: bool = True,
          do_eval: bool = True, eval_valid_every_epoch: int = 1,
          eval_test_every_epoch: int = 10, eval_batch_size: int = 0,
          save_every_epoch: int = 50, save_dir_root: str = "out/tiger",
          wandb_logging: bool = False, wandb_project: str = "",
          wandb_log_interval: int = 100, seed: int = 42, fast_rng: bool = True, shard_params: bool = False,
          resume_from_checkpoint: bool = False,
          max_steps_per_epoch: int = 0, sem_ids_table=None,
          dataset=None, model_parallelism: int = 1,
          steps_per_dispatch: int = 16, **unused) -> dict:
    logger = setup_logger("tiger", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    mesh = make_mesh(model=model_parallelism)

    # --- semantic-ID table (the RQ-VAE artifact contract) ---
    if sem_ids_table is not None:
        sem_ids = np.asarray(sem_ids_table, np.int32)
    else:
        if not pretrained_rqvae_path:
            raise ValueError("pretrained_rqvae_path (RQ-VAE artifact dir) "
                             "or sem_ids_table is required")
        _, rq_cfg, sem_ids = load_rqvae_artifact(
            pretrained_rqvae_path.format(split=split))
        if sem_ids is None:
            raise ValueError(
                f"artifact at {pretrained_rqvae_path} lacks sem_ids.npy — "
                f"re-run the RQ-VAE trainer to regenerate it")
        if rq_cfg["codebook_size"] != num_item_embeddings or \
                rq_cfg["n_layers"] != sem_id_dim:
            raise ValueError(
                f"RQ-VAE artifact ({rq_cfg['codebook_size']}^"
                f"{rq_cfg['n_layers']}) mismatches model config "
                f"({num_item_embeddings}^{sem_id_dim})")
    logger.info("semantic-id table: %s", sem_ids.shape)

    corpus = _load_corpus(dataset_type, dataset_folder, split)
    if corpus.num_items > len(sem_ids):
        raise ValueError(f"corpus has {corpus.num_items} items but code "
                         f"table only {len(sem_ids)}")

    pad_id = num_item_embeddings * sem_id_dim
    batch_fn = partial(tiger_batch, sem_ids=sem_ids, max_seq_len=max_seq_len,
                       pad_id=pad_id)
    eval_bs = eval_batch_size or batch_size
    pidx, pcnt = jax.process_index(), jax.process_count()
    # train-time random-crop subsampling (the P5 pipeline's augmentation,
    # reference p5_amazon.py:469-500) — a per-epoch Loader transform
    transform = None
    if subsample:
        from genrec_tpu.data.p5_amazon import subsample_crop
        transform = lambda smp, rng: subsample_crop(smp, max_seq_len, rng)
    train_loader = Loader(corpus.generate_samples("train"), batch_size,
                          batch_fn, shuffle=True, seed=seed,
                          process_index=pidx, process_count=pcnt,
                          transform=transform)
    valid_loader = Loader(corpus.generate_samples("valid"), eval_bs, batch_fn,
                          shuffle=False, process_index=pidx,
                          process_count=pcnt)
    test_loader = Loader(corpus.generate_samples("test"), eval_bs, batch_fn,
                         shuffle=False, process_index=pidx,
                         process_count=pcnt)
    logger.info("samples: train=%d valid=%d test=%d",
                len(train_loader.samples), len(valid_loader.samples),
                len(test_loader.samples))

    model = Tiger(embedding_dim=embedding_dim, attn_dim=attn_dim,
                  dropout=dropout, num_heads=num_heads, n_layers=n_layers,
                  num_item_embeddings=num_item_embeddings,
                  num_user_embeddings=num_user_embeddings,
                  sem_id_dim=sem_id_dim)

    rng = jax.random.PRNGKey(seed)
    sample = next(iter(train_loader))
    params = model.init(
        {"params": rng}, jnp.asarray(sample.user_ids),
        jnp.asarray(sample.sem_ids), jnp.asarray(sample.token_type_ids),
        jnp.asarray(sample.sem_ids_fut),
        jnp.asarray(sample.token_type_ids_fut),
        jnp.asarray(sample.seq_mask))["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    steps_per_epoch = len(train_loader)
    total_steps = epochs * max(steps_per_epoch, 1)
    schedule = make_schedule(name="cosine_warmup",
                             learning_rate=learning_rate,
                             num_warmup_steps=num_warmup_steps,
                             total_steps=total_steps)
    tx = make_optimizer(schedule, optimizer="adamw",
                        weight_decay=weight_decay, grad_clip_norm=1.0,
                        gradient_accumulate_every=gradient_accumulate_every)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch.user_ids, batch.sem_ids,
                          batch.token_type_ids, batch.sem_ids_fut,
                          batch.token_type_ids_fut, batch.seq_mask,
                          deterministic=False, rngs={"dropout": rng})
        # seq-length quantiles + per-digit loss (reference
        # modules/utils.py:101-137 compute_debug_metrics)
        from genrec_tpu.ops.debug import compute_debug_metrics
        dbg = compute_debug_metrics(batch.seq_mask, out.per_digit_loss,
                                    sem_id_dim)
        return out.loss, dbg

    engine = Engine(mesh, loss_fn, tx, params, rng=rng,
                    shard_params=shard_params)
    ckpt = CheckpointManager(os.path.join(save_dir_root, "ckpt"))
    if resume_from_checkpoint and engine.restore(ckpt):
        logger.info("resumed from step %d", engine.step)
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=pidx == 0)

    # trie over the valid catalog codes (reference builds it lazily on the
    # first generate; here it is compiled once, up front, on the host)
    trie = build_trie(sem_ids[:corpus.num_items], num_item_embeddings) \
        if use_trie else None
    generate = make_generate_fn(model, trie, num_beams=num_beams,
                                temperature=beam_temperature,
                                sample=beam_sample)
    acc = TopKAccumulator(ks=EVAL_KS)
    eval_rng = jax.random.PRNGKey(seed + 1)

    from genrec_tpu.core.preemption import PreemptionGuard
    guard = PreemptionGuard()
    timer = StepTimer()
    best_valid, results = -1.0, {}
    from genrec_tpu.core.engine import fused_epoch_steps
    for epoch in range(epochs):
        for n, metrics in fused_epoch_steps(
                engine, train_loader, steps_per_dispatch,
                max_steps=max_steps_per_epoch,
                intervals=(wandb_log_interval,)):
            timer.tick(n * batch_size)
            if engine.step % wandb_log_interval == 0:
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                host["examples_per_sec"] = timer.examples_per_sec
                mlogger.log(host, engine.step)
                if not np.isfinite(host["loss"]):
                    # failure detection: halt on divergence with the last
                    # good state on disk instead of burning the rest of
                    # the job (reference has none, SURVEY §5)
                    engine.save(ckpt, config=gin.operative_config())
                    raise RuntimeError(
                        f"non-finite loss {host['loss']} at step "
                        f"{engine.step}; state saved for post-mortem")
            if guard.should_stop():
                logger.warning("preemption signal: checkpointing at step %d "
                               "and exiting (resume with "
                               "train.resume_from_checkpoint=True)",
                               engine.step)
                engine.save(ckpt, config=gin.operative_config())
                mlogger.close()
                return {"preempted_at_step": engine.step}
        logger.info("epoch %d: loss=%.4f (%.0f ex/s)", epoch,
                    float(np.asarray(metrics["loss"])),
                    timer.examples_per_sec)
        if do_eval and (epoch + 1) % eval_valid_every_epoch == 0:
            m = evaluate(generate, engine.state.params, valid_loader, mesh,
                         acc, eval_rng)
            mlogger.log(m, engine.step, section="eval")
            logger.info("epoch %d valid: %s", epoch,
                        {k: round(v, 4) for k, v in m.items()})
            best_valid = max(best_valid, m["Recall@10"])
        if do_eval and (epoch + 1) % eval_test_every_epoch == 0:
            m = evaluate(generate, engine.state.params, test_loader, mesh,
                         acc, eval_rng)
            mlogger.log(m, engine.step, section="test")
            logger.info("epoch %d test: %s", epoch,
                        {k: round(v, 4) for k, v in m.items()})
            results = m
        if (epoch + 1) % save_every_epoch == 0:
            engine.save(ckpt, config=gin.operative_config())

    results = evaluate(generate, engine.state.params, test_loader, mesh, acc,
                       eval_rng)
    logger.info("final test: %s", {k: round(v, 4) for k, v in results.items()})
    mlogger.log(results, engine.step, section="test")
    engine.save(ckpt, config=gin.operative_config())
    mlogger.close()
    return results


if __name__ == "__main__":
    parse_config()
    train()
