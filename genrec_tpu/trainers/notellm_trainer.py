"""NoteLLM trainer: contrastive [EMB] embedding training.

The reference defines ``Query2Embedding`` but wires **no trainer**
(``/root/reference/genrec/trainers/__init__.py:128-135``; HF ``Trainer``
usage is only implied via ``EvalPrediction``). This trainer closes that gap
with the generic engine: paired (query, doc) batches — rows (2i, 2i+1) are
positives — trained with the model's contrastive loss and evaluated with
top-k retrieval accuracy (``models/notellm.py:236-265`` parity).

Run: ``python -m genrec_tpu.trainers.notellm_trainer config/notellm/synthetic.gin``
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from genrec_tpu.configlib import gin, parse_config
from genrec_tpu.core import (Engine, MetricLogger, StepTimer, make_optimizer,
                             make_schedule, setup_logger)
from genrec_tpu.models.notellm import Query2Embedding, compute_metrics
from genrec_tpu.parallel import make_mesh


def synthetic_pairs(n_pairs: int, vocab: int, seq_len: int, emb_token: int,
                    n_topics: int = 32, seed: int = 0) -> np.ndarray:
    """(2N, L) token batch where rows (2i, 2i+1) share a topic vocabulary —
    the learnable stand-in for query/doc pairs."""
    rng = np.random.default_rng(seed)
    pools = rng.integers(emb_token + 1, vocab, size=(n_topics, 32))
    out = np.zeros((2 * n_pairs, seq_len), np.int32)
    for i in range(n_pairs):
        topic = rng.integers(0, n_topics)
        for j in (2 * i, 2 * i + 1):
            n = int(rng.integers(seq_len // 2, seq_len - 1))
            out[j, :n] = rng.choice(pools[topic], size=n)
            out[j, n] = emb_token          # [EMB] terminates the text
    return out


@gin.configurable
def train(steps: int = 200, learning_rate: float = 3e-4,
          batch_pairs: int = 32, vocab_size: int = 2000,
          seq_len: int = 24, emb_token_id: int = 5,
          d_model: int = 128, n_layers: int = 2, n_heads: int = 4,
          n_kv_heads: int = 2, ff_dim: int = 256, alpha: float = 0.0,
          n_topics: int = 32, eval_pairs: int = 128, eval_every: int = 50,
          shared_prompt_len: int = 0, share_prompt_kv: bool = False,
          save_dir_root: str = "out/notellm", wandb_logging: bool = False,
          wandb_project: str = "", seed: int = 42, fast_rng: bool = True,
          model_parallelism: int = 1, fsdp: bool = False, **unused) -> dict:
    """``shared_prompt_len`` P > 0 prepends a fixed instruction prefix (the
    reference's note-compression prompt template) to every row;
    ``share_prompt_kv`` then trains via the shared-prompt KV cache
    (reference ``DynamicCache`` re-design, models/notellm.py:20-41) instead
    of re-running the prompt through the transformer B times per step."""
    logger = setup_logger("notellm", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    mesh = make_mesh(model=model_parallelism)

    model = Query2Embedding(
        vocab_size=vocab_size, emb_token_id=emb_token_id, d_model=d_model,
        n_layers=n_layers, n_heads=n_heads, n_kv_heads=n_kv_heads,
        ff_dim=ff_dim, max_len=seq_len + shared_prompt_len, alpha=alpha)

    prompt = None
    if shared_prompt_len > 0:
        prng = np.random.default_rng(seed + 9)
        prompt = jnp.asarray(prng.integers(
            emb_token_id + 1, vocab_size,
            size=(shared_prompt_len,)).astype(np.int32))

    def with_prompt(batch):
        """Baseline layout: prompt prepended to every row (full forward)."""
        B = batch.shape[0]
        return jnp.concatenate(
            [jnp.broadcast_to(prompt[None], (B, prompt.shape[0])), batch],
            axis=1)

    rng = jax.random.PRNGKey(seed)
    sample = jnp.asarray(synthetic_pairs(batch_pairs, vocab_size, seq_len,
                                         emb_token_id, n_topics, seed))
    init_input = with_prompt(sample) if prompt is not None else sample
    params = model.init({"params": rng}, init_input)["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    schedule = make_schedule(name="cosine_warmup",
                             learning_rate=learning_rate,
                             num_warmup_steps=max(steps // 10, 1),
                             total_steps=steps)
    tx = make_optimizer(schedule, optimizer="adamw", weight_decay=0.01,
                        grad_clip_norm=1.0)

    def loss_fn(params, batch, rng):
        if prompt is not None and share_prompt_kv:
            out = model.apply({"params": params}, batch,
                              shared_prompt_ids=prompt)
        elif prompt is not None:
            out = model.apply({"params": params}, with_prompt(batch))
        else:
            out = model.apply({"params": params}, batch)
        return out.loss, {"contrastive_loss": out.contrastive_loss}

    # fsdp: ZeRO-3 placement over the data axis (same path as the LCRec
    # trainer) for full fine-tuning of a real Qwen-class backbone
    engine = Engine(mesh, loss_fn, tx, params, rng=rng,
                    shard_params="fsdp" if fsdp else False)
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=jax.process_index() == 0)

    @jax.jit
    def embed(params, batch):
        if prompt is not None and share_prompt_kv:
            return model.apply({"params": params}, batch,
                               shared_prompt_ids=prompt).embeddings
        if prompt is not None:
            return model.apply({"params": params},
                               with_prompt(batch)).embeddings
        return model.apply({"params": params}, batch).embeddings

    eval_batch = synthetic_pairs(eval_pairs, vocab_size, seq_len,
                                 emb_token_id, n_topics, seed + 1)
    timer = StepTimer()
    data_rng = np.random.default_rng(seed + 2)
    metrics = {}
    for step in range(1, steps + 1):
        batch = synthetic_pairs(batch_pairs, vocab_size, seq_len,
                                emb_token_id, n_topics,
                                int(data_rng.integers(1 << 31)))
        m = engine.run_step(jnp.asarray(batch))
        timer.tick(2 * batch_pairs)
        if step % eval_every == 0:
            emb = np.asarray(embed(engine.state.params,
                                   jnp.asarray(eval_batch)))
            metrics = compute_metrics(emb[0::2], emb[1::2])
            mlogger.log(metrics, step, section="eval")
            logger.info("step %d: loss=%.4f retrieval=%s (%.0f ex/s)", step,
                        float(np.asarray(m["loss"])),
                        {k: round(v, 3) for k, v in metrics.items()},
                        timer.examples_per_sec)
    mlogger.close()
    return metrics


if __name__ == "__main__":
    parse_config()
    train()
