"""COBRA trainer: cascaded sparse+dense training and beam-fusion eval.

Parity target: ``/root/reference/genrec/trainers/cobra_trainer.py`` —
teacher-forcing collate appending the target item (:25-88), weighted
sparse+dense loss (:359-362), epoch-accumulated token-acc/recall, eval via
``beam_fusion`` against freshly recomputed all-item dense vectors
(``compute_item_dense_vecs`` :303-334, eval loop :413-456).

Run: ``python -m genrec_tpu.trainers.cobra_trainer config/cobra/synthetic.gin``
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
from genrec_tpu.data import Loader
from genrec_tpu.data.cobra import (amazon_item_tokens, cobra_batch,
                                   synthetic_item_tokens)
from genrec_tpu.models.cobra import Cobra, beam_fusion
from genrec_tpu.ops import TopKAccumulator, topk_metric_sums
from genrec_tpu.parallel import make_mesh

EVAL_KS = (1, 5, 10)


def compute_item_dense_vecs(model, params, item_tokens: np.ndarray,
                            batch_size: int = 512) -> np.ndarray:
    """All-item dense vectors from the current encoder (ref :303-334)."""
    @jax.jit
    def enc(p, toks):
        return model.apply({"params": p}, toks, method=Cobra.generate_itemvec)

    from genrec_tpu.ops.batched import batched_apply
    return batched_apply(lambda t: enc(params, t), item_tokens, batch_size)


@gin.configurable
def train(epochs: int = 10, learning_rate: float = 1e-4,
          num_warmup_steps: int = 100, weight_decay: float = 0.01,
          batch_size: int = 64, sparse_loss_weight: float = 1.0,
          dense_loss_weight: float = 1.0,
          id_vocab_size: int = 64, n_codebooks: int = 3, d_model: int = 256,
          encoder_n_layers: int = 1, encoder_vocab_size: int = 32128,
          encoder_hidden_dim: int = 768, encoder_num_heads: int = 8,
          decoder_n_layers: int = 4, decoder_num_heads: int = 4,
          decoder_dropout: float = 0.1, temperature: float = 0.2,
          max_items: int = 10,
          dataset_type: str = "synthetic",
          dataset_folder: str = "dataset/amazon", split: str = "beauty",
          pretrained_rqvae_path: str = "",
          n_beam: int = 50, fusion_alpha: float = 0.5,
          do_eval: bool = True, eval_every_epoch: int = 1,
          eval_batch_size: int = 0,
          save_dir_root: str = "out/cobra", save_every_epoch: int = 50,
          wandb_logging: bool = False, wandb_project: str = "",
          wandb_log_interval: int = 50, seed: int = 42, fast_rng: bool = True,
          resume_from_checkpoint: bool = False,
          max_steps_per_epoch: int = 0, sem_ids_table=None,
          model_parallelism: int = 1, dedupe_texts: bool = True,
          train_samples=None, eval_samples=None, item_tokens_table=None,
          **unused) -> dict:
    logger = setup_logger("cobra", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    mesh = make_mesh(model=model_parallelism)

    if dataset_type == "synthetic":
        from genrec_tpu.data.synthetic import synthetic_corpus
        _, corpus = synthetic_corpus()
        item_tokens = synthetic_item_tokens(
            n_items=corpus.num_items, vocab_size=encoder_vocab_size)
    elif dataset_type == "amazon":
        from genrec_tpu.data.amazon import amazon_corpus
        corpus = amazon_corpus(root=dataset_folder, split=split)
        item_tokens = amazon_item_tokens(dataset_folder, split,
                                         vocab_size=encoder_vocab_size)
    else:
        raise ValueError(f"Unknown dataset_type: {dataset_type!r}")

    if sem_ids_table is not None:
        sem_ids = np.asarray(sem_ids_table, np.int32)
    elif pretrained_rqvae_path:
        _, _, sem_ids = load_rqvae_artifact(
            pretrained_rqvae_path.format(split=split))
    else:
        raise ValueError("pretrained_rqvae_path or sem_ids_table required")
    C = sem_ids.shape[1]
    assert C == n_codebooks, (C, n_codebooks)
    pad_id = id_vocab_size * n_codebooks
    logger.info("items=%d codes=%s", corpus.num_items, sem_ids.shape)

    # one sample per user (no sliding window; ref amazon_cobra.py:168-209):
    # teacher forcing covers all positions in a single pass. Explicit
    # sample lists override (head-to-head parity injects the reference's
    # exact split semantics); item_tokens_table likewise.
    if item_tokens_table is not None:
        item_tokens = np.asarray(item_tokens_table, np.int32)
    if train_samples is None:
        train_samples = corpus.generate_samples("valid")  # sans test item
    if eval_samples is None:
        eval_samples = corpus.generate_samples("test")

    pidx, pcnt = jax.process_index(), jax.process_count()
    # unique-text dedupe: the dominant cost is the O(B·T) text-encoder
    # recompute; encoding each unique batch item once is the same math at
    # catalog-bounded cost (data/cobra._dedupe_rows). Local row indices
    # don't survive multi-process global-batch assembly, so gate on pcnt.
    dedupe = (dedupe_texts and pcnt == 1
              and not os.environ.get("GENREC_TPU_NO_TEXT_DEDUPE"))
    train_loader = Loader(
        train_samples, batch_size,
        partial(cobra_batch, sem_ids=sem_ids, item_tokens=item_tokens,
                max_items=max_items, pad_id=pad_id, include_target=True,
                dedupe_texts=dedupe),
        shuffle=True, seed=seed, process_index=pidx, process_count=pcnt)
    eval_loader = Loader(
        eval_samples, eval_batch_size or batch_size,
        partial(cobra_batch, sem_ids=sem_ids, item_tokens=item_tokens,
                max_items=max_items, pad_id=pad_id, include_target=False,
                dedupe_texts=dedupe),
        shuffle=False, process_index=pidx, process_count=pcnt)

    model = Cobra(encoder_n_layers=encoder_n_layers,
                  encoder_vocab_size=encoder_vocab_size,
                  encoder_hidden_dim=encoder_hidden_dim,
                  encoder_num_heads=encoder_num_heads,
                  id_vocab_size=id_vocab_size, n_codebooks=n_codebooks,
                  d_model=d_model, temperature=temperature,
                  decoder_n_layers=decoder_n_layers,
                  decoder_num_heads=decoder_num_heads,
                  decoder_dropout=decoder_dropout)

    rng = jax.random.PRNGKey(seed)
    sample = next(iter(train_loader))
    params = model.init(
        {"params": rng}, jnp.asarray(sample.input_ids),
        jnp.asarray(sample.encoder_input_ids),
        text_idx=None if sample.text_idx is None
        else jnp.asarray(sample.text_idx))["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    total_steps = epochs * max(len(train_loader), 1)
    schedule = make_schedule(name="cosine_warmup",
                             learning_rate=learning_rate,
                             num_warmup_steps=num_warmup_steps,
                             total_steps=total_steps)
    tx = make_optimizer(schedule, optimizer="adamw",
                        weight_decay=weight_decay, grad_clip_norm=1.0)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch.input_ids,
                          batch.encoder_input_ids, deterministic=False,
                          text_idx=batch.text_idx, rngs={"dropout": rng})
        loss = sparse_loss_weight * out.loss_sparse + \
            dense_loss_weight * out.loss_dense
        return loss, {
            "loss_sparse": out.loss_sparse, "loss_dense": out.loss_dense,
            "token_acc": out.acc_correct / jnp.maximum(out.acc_total, 1),
            "item_recall": out.recall_correct /
            jnp.maximum(out.recall_total, 1),
            "vec_cos_sim": out.vec_cos_sim,
            "codebook_entropy": out.codebook_entropy,
        }

    engine = Engine(mesh, loss_fn, tx, params, rng=rng)
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=pidx == 0)
    ckpt = CheckpointManager(os.path.join(save_dir_root, "ckpt"))
    if resume_from_checkpoint and engine.restore(ckpt):
        logger.info("resumed from step %d", engine.step)
    acc = TopKAccumulator(ks=EVAL_KS)

    def evaluate() -> dict:
        acc.reset()
        item_vecs = compute_item_dense_vecs(model, engine.state.params,
                                            item_tokens)
        for batch in eval_loader:
            out = beam_fusion(
                model, engine.state.params, jnp.asarray(batch.input_ids),
                jnp.asarray(batch.encoder_input_ids),
                jnp.asarray(item_vecs), jnp.asarray(sem_ids),
                n_candidates=max(EVAL_KS), n_beam=n_beam,
                alpha=fusion_alpha,
                text_idx=None if batch.text_idx is None
                else jnp.asarray(batch.text_idx))
            sums = topk_metric_sums(
                jnp.asarray(batch.target_item)[:, None],
                out.item_ids[:, :, None], EVAL_KS,
                valid=jnp.asarray(batch.valid))
            acc.update_sums({k: float(np.asarray(v))
                             for k, v in sums.items()})
        return acc.reduce()

    from genrec_tpu.core.preemption import PreemptionGuard
    guard = PreemptionGuard()
    timer = StepTimer()
    for epoch in range(epochs):
        for i, batch in enumerate(train_loader):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            metrics = engine.run_step(batch)
            timer.tick(batch.input_ids.shape[0])
            if guard.should_stop():
                logger.warning("preemption signal: checkpointing at step %d and exiting", engine.step)
                engine.save(ckpt, config=gin.operative_config())
                return {"preempted_at_step": engine.step}
            if engine.step % wandb_log_interval == 0:
                mlogger.log({k: float(np.asarray(v))
                             for k, v in metrics.items()}, engine.step)
        logger.info("epoch %d: loss=%.4f acc=%.3f recall=%.3f (%.0f ex/s)",
                    epoch, float(np.asarray(metrics["loss"])),
                    float(np.asarray(metrics["token_acc"])),
                    float(np.asarray(metrics["item_recall"])),
                    timer.examples_per_sec)
        if do_eval and (epoch + 1) % eval_every_epoch == 0:
            m = evaluate()
            mlogger.log(m, engine.step, section="eval")
            logger.info("epoch %d eval: %s", epoch,
                        {k: round(v, 4) for k, v in m.items()})
        if (epoch + 1) % save_every_epoch == 0:
            engine.save(ckpt, config=gin.operative_config())

    final = evaluate()
    logger.info("final: %s", {k: round(v, 4) for k, v in final.items()})
    engine.save(ckpt, config=gin.operative_config())
    mlogger.close()
    return final


if __name__ == "__main__":
    parse_config()
    train()
