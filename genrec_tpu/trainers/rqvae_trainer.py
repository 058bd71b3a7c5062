"""RQ-VAE trainer: semantic-ID learning over item text embeddings.

Parity target: ``/root/reference/genrec/trainers/rqvae_trainer.py`` —
epoch- or iteration-based loops (:90-96), first-step k-means warmup on a
~20k-row megabatch (:218-228), AdamW + linear-warmup schedule (:160-171),
grad-clip 1.0, fixed gumbel temperature 0.2 (:215), eval loss +
**collision-rate** sweep over the full train set (:26-47), checkpointing with
model config (:313-324), resume via ``pretrained_rqvae_path`` (:183-194).

On exit the trainer writes the versioned RQ-VAE **artifact** (params + config
+ the precomputed ``sem_ids`` table for all items) that TIGER/LCRec/COBRA
datasets consume — the cross-component contract of SURVEY.md §5.

Run: ``python -m genrec_tpu.trainers.rqvae_trainer config/tiger/amazon/rqvae.gin
--split beauty``
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configlib import gin, parse_config
from genrec_tpu.core import (CheckpointManager, Engine, MetricLogger,
                             StepTimer, make_optimizer, make_schedule,
                             save_rqvae_artifact, setup_logger)
from genrec_tpu.models.rqvae import (QuantizeForwardMode, RqVae,
                                     kmeans_init_params)
from genrec_tpu.parallel import make_mesh


def compute_semantic_ids(model: RqVae, params, embeddings: np.ndarray,
                         batch_size: int = 4096) -> np.ndarray:
    """Encode all items → (N, C) code table (jit, batched, eval mode)."""
    @jax.jit
    def encode(p, x):
        return model.apply({"params": p}, x, method=RqVae.get_semantic_ids,
                           train=False).sem_ids

    from genrec_tpu.ops.batched import batched_apply
    return batched_apply(lambda x: encode(params, x), embeddings,
                         batch_size).astype(np.int32)


def compute_collision_rate(sem_ids: np.ndarray) -> float:
    """Fraction of items whose code tuple collides (ref rqvae_trainer.py:26-47)."""
    n_unique = len(np.unique(sem_ids, axis=0))
    return 1.0 - n_unique / len(sem_ids)


def add_disambiguation_suffix(sem_ids: np.ndarray) -> np.ndarray:
    """Append a collision-breaking extra code level (off by default, as in
    the reference config): items sharing a code tuple get incremental
    suffixes 0, 1, 2, … in item-id order, making every (C+1)-tuple unique.
    Reference parity: ``/root/reference/genrec/data/amazon.py:323-353``.
    """
    sem_ids = np.asarray(sem_ids)
    _, inverse = np.unique(sem_ids, axis=0, return_inverse=True)
    suffix = np.zeros(len(sem_ids), np.int32)
    counts: dict = {}
    for i, g in enumerate(inverse):
        suffix[i] = counts.get(g, 0)
        counts[g] = suffix[i] + 1
    return np.concatenate([sem_ids, suffix[:, None]], axis=1)


def _load_item_dataset(dataset_type: str, dataset_folder: str, split: str,
                       encoder_model_name: str, train_test_split: str):
    if dataset_type == "synthetic":
        from genrec_tpu.data.synthetic import SyntheticItemDataset
        return SyntheticItemDataset(train_test_split=train_test_split)
    if dataset_type == "p5":
        from genrec_tpu.data.p5_amazon import P5ItemDataset
        return P5ItemDataset(root=dataset_folder, split=split,
                             train_test_split=train_test_split,
                             encoder_model_name=encoder_model_name)
    if dataset_type != "amazon":
        raise ValueError(f"Unknown dataset_type: {dataset_type!r}")
    from genrec_tpu.data.amazon import AmazonItemDataset
    return AmazonItemDataset(root=dataset_folder, split=split,
                             train_test_split=train_test_split,
                             encoder_model_name=encoder_model_name)


@gin.configurable
def train(epochs: int = 5000, iterations: int = 0,
          warmup_epochs: int = 50, num_warmup_steps: int = 0,
          learning_rate: float = 1e-3, weight_decay: float = 1e-4,
          batch_size: int = 1024, steps_per_dispatch: int = 32,
          vae_input_dim: int = 768, vae_embed_dim: int = 32,
          vae_hidden_dims=(512, 256, 128, 64), vae_codebook_size: int = 256,
          vae_codebook_normalize: bool = False, vae_sim_vq: bool = False,
          vae_n_layers: int = 3, vae_n_cat_feats: int = 0,
          vae_codebook_mode: QuantizeForwardMode = QuantizeForwardMode.STE,
          vae_codebook_last_layer_mode: QuantizeForwardMode =
          QuantizeForwardMode.SINKHORN,
          commitment_weight: float = 0.25, gumbel_temperature: float = 0.2,
          dataset_type: str = "amazon", dataset_folder: str = "dataset/amazon",
          split: str = "beauty", encoder_model_name: str = "hashed",
          kmeans_init_batch: int = 20000, kmeans_init_mode: str = "kmeans++",
          add_disambiguation: bool = False,
          do_eval: bool = True, eval_every: int = 50,
          save_model_every: int = 50, save_dir_root: str = "out/rqvae",
          pretrained_rqvae_path: str = "",
          wandb_logging: bool = False, wandb_project: str = "",
          wandb_log_interval: int = 100, seed: int = 42, fast_rng: bool = True,
          resume_from_checkpoint: bool = False,
          dataset=None, model_parallelism: int = 1, **unused) -> dict:
    logger = setup_logger("rqvae", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    mesh = make_mesh(model=model_parallelism)

    train_ds = _load_item_dataset(dataset_type, dataset_folder, split,
                                  encoder_model_name, "train")
    eval_ds = _load_item_dataset(dataset_type, dataset_folder, split,
                                 encoder_model_name, "eval")
    all_ds = _load_item_dataset(dataset_type, dataset_folder, split,
                                encoder_model_name, "all")
    train_emb = np.asarray(train_ds.embeddings, np.float32)
    eval_emb = np.asarray(eval_ds.embeddings, np.float32)
    all_emb = np.asarray(all_ds.embeddings, np.float32)
    logger.info("items: train=%d eval=%d all=%d dim=%d", len(train_emb),
                len(eval_emb), len(all_emb), train_emb.shape[-1])

    model = RqVae(
        input_dim=vae_input_dim, embed_dim=vae_embed_dim,
        hidden_dims=tuple(vae_hidden_dims), codebook_size=vae_codebook_size,
        codebook_normalize=vae_codebook_normalize,
        codebook_sim_vq=vae_sim_vq, codebook_mode=vae_codebook_mode,
        codebook_last_layer_mode=vae_codebook_last_layer_mode,
        n_layers=vae_n_layers, commitment_weight=commitment_weight,
        n_cat_features=vae_n_cat_feats)
    model_config = dict(
        input_dim=vae_input_dim, embed_dim=vae_embed_dim,
        hidden_dims=list(vae_hidden_dims), codebook_size=vae_codebook_size,
        codebook_normalize=vae_codebook_normalize,
        codebook_sim_vq=vae_sim_vq, n_layers=vae_n_layers,
        n_cat_features=vae_n_cat_feats,
        codebook_mode=vae_codebook_mode.name,
        codebook_last_layer_mode=vae_codebook_last_layer_mode.name)

    rng = jax.random.PRNGKey(seed)
    init_rng, km_rng, train_rng = jax.random.split(rng, 3)
    params = model.init({"params": init_rng},
                        jnp.asarray(train_emb[:2]), gumbel_t=0.2,
                        train=False)["params"]

    ckpt = CheckpointManager(os.path.join(save_dir_root, "ckpt"))
    if pretrained_rqvae_path:
        from genrec_tpu.core import load_rqvae_artifact
        params, _, _ = load_rqvae_artifact(pretrained_rqvae_path, params)
        logger.info("resumed params from %s", pretrained_rqvae_path)
    else:
        # k-means warmup on a megabatch (reference :218-228)
        warm = train_emb[:kmeans_init_batch]
        params = kmeans_init_params(model, params, jnp.asarray(warm), km_rng,
                                    init=kmeans_init_mode)
        logger.info("k-means codebook init on %d rows (%s)", len(warm),
                    kmeans_init_mode)

    # steps: epoch-based (default) or iteration-based (mutually exclusive)
    steps_per_epoch = max(len(train_emb) // batch_size, 1)
    total_steps = iterations if iterations else epochs * steps_per_epoch
    warmup = num_warmup_steps if num_warmup_steps else \
        warmup_epochs * steps_per_epoch
    schedule = make_schedule(name="linear_warmup",
                             learning_rate=learning_rate,
                             num_warmup_steps=warmup, total_steps=total_steps)
    tx = make_optimizer(schedule, optimizer="adamw",
                        weight_decay=weight_decay, grad_clip_norm=1.0)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch,
                          gumbel_t=gumbel_temperature, train=True, rng=rng)
        return out.loss, {
            "reconstruction_loss": out.reconstruction_loss,
            "rqvae_loss": out.rqvae_loss,
            "p_unique_ids": out.p_unique_ids,
        }

    engine = Engine(mesh, loss_fn, tx, params, rng=train_rng)
    if resume_from_checkpoint and engine.restore(ckpt):
        logger.info("resumed from step %d", engine.step)
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=jax.process_index() == 0)

    @jax.jit
    def eval_loss(params, batch):
        out = model.apply({"params": params}, batch, gumbel_t=0.2,
                          train=False)
        return out.loss, out.reconstruction_loss

    from genrec_tpu.core.preemption import PreemptionGuard
    guard = PreemptionGuard()
    data_rng = np.random.default_rng(seed)
    timer = StepTimer()
    step = 0
    # scan-fused multi-step: the RQ-VAE step is tiny (µs of compute in a
    # ms-scale dispatch), so up to steps_per_dispatch optimizer steps run
    # per XLA program (engine.run_steps). Chunks stop exactly on every
    # log/eval/save boundary, so cadence semantics match the 1-step loop.
    S = max(int(steps_per_dispatch), 1)
    intervals = [i for i in (
        wandb_log_interval, eval_every * steps_per_epoch,
        save_model_every * steps_per_epoch) if i > 0]

    def next_boundary(s: int) -> int:
        return min([total_steps] +
                   [(s // i + 1) * i for i in intervals])

    B_eff = min(batch_size, len(train_emb))
    while step < total_steps:
        n = max(min(S, next_boundary(step) - step), 1)
        idx = np.stack([data_rng.choice(len(train_emb), size=B_eff,
                                        replace=False) for _ in range(n)])
        if n == 1:
            metrics = engine.run_step(jnp.asarray(train_emb[idx[0]]))
        else:
            metrics = engine.run_steps(train_emb[idx])
        timer.tick(n * B_eff)
        step = engine.step
        if guard.should_stop():
            logger.warning("preemption signal: checkpointing at step %d "
                           "and exiting", step)
            engine.save(ckpt, config=model_config)
            return {"preempted_at_step": step}
        if step % wandb_log_interval == 0:
            host = {k: float(np.asarray(v)) for k, v in metrics.items()}
            host["examples_per_sec"] = timer.examples_per_sec
            mlogger.log(host, step)
        epoch = step // steps_per_epoch
        if do_eval and len(eval_emb) > 0 and \
                step % (eval_every * steps_per_epoch) == 0:
            el, erl = eval_loss(engine.state.params, jnp.asarray(eval_emb))
            sem_ids = compute_semantic_ids(model, engine.state.params,
                                           train_emb)
            cr = compute_collision_rate(sem_ids)
            em = {"eval_loss": float(el), "eval_recon_loss": float(erl),
                  "collision_rate": cr}
            mlogger.log(em, step, section="eval")
            logger.info("step %d (epoch %d): loss=%.4f eval=%s (%.0f ex/s)",
                        step, epoch, float(np.asarray(metrics["loss"])),
                        {k: round(v, 4) for k, v in em.items()},
                        timer.examples_per_sec)
        if step % (save_model_every * steps_per_epoch) == 0:
            engine.save(ckpt, config=model_config)

    # final artifact: params + config + full-catalog code table
    sem_ids = compute_semantic_ids(model, engine.state.params, all_emb)
    final_cr = compute_collision_rate(sem_ids)
    logger.info("final collision rate (all items): %.4f", final_cr)
    if add_disambiguation:
        sem_ids = add_disambiguation_suffix(sem_ids)
        logger.info("disambiguation suffix appended: %d levels, "
                    "max suffix %d, all-unique=%s", sem_ids.shape[1],
                    int(sem_ids[:, -1].max()),
                    len(np.unique(sem_ids, axis=0)) == len(sem_ids))
    artifact_dir = os.path.join(save_dir_root, "artifact")
    save_rqvae_artifact(
        artifact_dir,
        jax.tree_util.tree_map(np.asarray, engine.state.params),
        model_config, sem_ids=sem_ids)
    logger.info("wrote RQ-VAE artifact to %s", artifact_dir)
    mlogger.close()
    return {"collision_rate": final_cr, "artifact_dir": artifact_dir,
            "sem_ids": sem_ids}


if __name__ == "__main__":
    parse_config()
    train()
