"""LCRec trainer: SFT over 6 alignment tasks + constrained-decoding eval.

Parity target: ``/root/reference/genrec/trainers/lcrec_trainer.py`` — SFT
collate with prompt-masked labels (−100) and padding (:43-84), constrained
decoding per codebook level (:87-128, compiled into the beam search here),
eval parsing ``<Ci_j>`` and scoring exact/TopK for seqrec (:131-239),
``max_train_samples`` debug cap (:327-333), eval-only mode (:357-364),
HF-format checkpoints (:419-430), and optional LoRA (:306-315 — here
``use_lora=True`` adds low-rank adapters to every projection and freezes the
base weights via an Engine-level trainable/frozen split).

Run: ``python -m genrec_tpu.trainers.lcrec_trainer config/lcrec/synthetic.gin``
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configlib import gin, parse_config
from genrec_tpu.core import (Engine, MetricLogger, StepTimer,
                             load_rqvae_artifact, make_optimizer,
                             make_schedule, setup_logger)
from genrec_tpu.data.lcrec import LCRecTaskGenerator
from genrec_tpu.models.lcrec import LCRec
from genrec_tpu.ops import TopKAccumulator, topk_metric_sums
from genrec_tpu.parallel import make_mesh, shard_batch

EVAL_KS = (1, 5, 10)


def sft_collate(model: LCRec, samples: List[dict], max_len: int):
    """Right-padded input ids + prompt-masked labels (−100).

    Tokenization is memoized on the sample dict: samples are reused every
    epoch and subword tokenization is the loader's host-side hot spot."""
    B = len(samples)
    ids = np.zeros((B, max_len), np.int32)
    mask = np.zeros((B, max_len), np.int32)
    labels = np.full((B, max_len), -100, np.int32)
    for r, s in enumerate(samples):
        tok = s.get("_tok")
        if tok is None:
            tok = s["_tok"] = model.tokenize_sft(s["prompt"], s["response"])
        seq = tok["input_ids"][:max_len]
        p_len = min(tok["prompt_seq_length"], max_len)
        ids[r, :len(seq)] = seq
        mask[r, :len(seq)] = 1
        labels[r, p_len:len(seq)] = seq[p_len:len(seq)]
    return {"input_ids": ids, "attention_mask": mask, "labels": labels,
            "valid": np.ones((B,), bool)}


def eval_collate(model: LCRec, samples: List[dict], max_len: int):
    """Left-padded prompts for generation + target code tuples."""
    B = len(samples)
    C = model.num_codebooks
    ids = np.zeros((B, max_len), np.int32)
    mask = np.zeros((B, max_len), np.int32)
    tgt = np.zeros((B, C), np.int32)
    for r, s in enumerate(samples):
        p = s.get("_ptok")
        if p is None:
            p = s["_ptok"] = model.tokenizer.encode(s["prompt"])
        p = p[-max_len:]
        ids[r, max_len - len(p):] = p
        mask[r, max_len - len(p):] = 1
        tgt[r] = s["target_sem_ids"]
    return {"input_ids": ids, "attention_mask": mask,
            "target_sem_ids": tgt, "valid": np.ones((B,), bool)}


@gin.configurable
def train(epochs: int = 4, learning_rate: float = 1e-4,
          num_warmup_steps: int = 100, weight_decay: float = 0.01,
          batch_size: int = 16, max_len: int = 512, eval_max_len: int = 0,
          d_model: int = 512, n_layers: int = 8, n_heads: int = 8,
          n_kv_heads: int = 4, ff_dim: int = 1408, base_vocab: int = 30000,
          num_codebooks: int = 5, codebook_size: int = 256,
          use_lora: bool = False, lora_rank: int = 8,
          lora_alpha: float = 16.0, lora_r: int = 0,
          pretrained_backbone_path: str = "", backbone: str = "",
          remat: bool = False, fsdp: bool = False,
          vocab_parallel_ce: bool = False,
          sequence_parallelism: bool = False,
          pipeline_parallelism: int = 1, pp_microbatches: int = 4,
          dataset_type: str = "synthetic",
          dataset_folder: str = "dataset/amazon", split: str = "beauty",
          pretrained_rqvae_path: str = "", sem_ids_table=None,
          max_seq_len: int = 20, num_beams: int = 10,
          use_item_trie: bool = False,
          eval_tasks: tuple = ("seqrec",),
          eval_max_items_per_task: int = 0,
          max_train_samples: int = 0, max_eval_samples: int = 0,
          do_eval: bool = True, eval_every_epoch: int = 1,
          eval_batch_size: int = 0, eval_only: bool = False,
          save_dir_root: str = "out/lcrec", save_every_epoch: int = 2,
          wandb_logging: bool = False, wandb_project: str = "",
          wandb_log_interval: int = 50, seed: int = 42, fast_rng: bool = True,
          max_steps_per_epoch: int = 0, model_parallelism: int = 1,
          train_samples=None, eval_samples=None, **unused) -> dict:
    logger = setup_logger("lcrec", save_dir_root)
    from genrec_tpu.core.rng import configure_fast_rng
    configure_fast_rng(fast_rng)
    if pipeline_parallelism > 1:
        if model_parallelism > 1 or fsdp or vocab_parallel_ce \
                or sequence_parallelism:
            raise ValueError("pipeline_parallelism composes with the data "
                             "axis only (set model_parallelism=1, "
                             "fsdp/vocab_parallel_ce/sequence_parallelism "
                             "off)")
        from genrec_tpu.parallel import make_pipeline_mesh
        mesh = make_pipeline_mesh(pipe=pipeline_parallelism)
    else:
        mesh = make_mesh(model=model_parallelism)
    if sequence_parallelism:
        if model_parallelism <= 1:
            raise ValueError("sequence_parallelism shards the sequence "
                             "over the model axis: set model_parallelism>1")
        if fsdp or vocab_parallel_ce:
            raise ValueError("sequence_parallelism is incompatible with "
                             "fsdp / vocab_parallel_ce")

    if dataset_type == "synthetic":
        from genrec_tpu.data.synthetic import synthetic_corpus
        _, corpus = synthetic_corpus()
        titles = [f"synthetic item {i} cluster c{i % 31}"
                  for i in range(corpus.num_items)]
        descs = None
    elif dataset_type == "amazon":
        from genrec_tpu.data.amazon import AmazonRaw, amazon_corpus
        corpus = amazon_corpus(root=dataset_folder, split=split)
        raw = AmazonRaw(dataset_folder, split)
        texts = raw.item_texts(raw.item_id_mapping())
        titles = [t.split("\n")[0].replace("'title':", "").strip()
                  for t in texts]
        descs = texts
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
    if C != num_codebooks:
        raise ValueError(f"artifact has {C} levels, config says "
                         f"{num_codebooks}")
    if sem_ids.max() >= codebook_size:
        raise ValueError("sem_ids exceed codebook_size")

    # accept the reference's peft knob name lora_r as an alias
    if lora_r:
        lora_rank = lora_r
    if use_lora and lora_rank <= 0:
        raise ValueError("use_lora=True requires lora_rank > 0")
    # ``backbone``: converted-Qwen2 artifact (scripts/convert_qwen2.py) —
    # pretrained weights + its own subword tokenizer; architecture dims
    # then come from the artifact, not the d_model/... gin knobs
    model = LCRec(d_model=d_model, n_layers=n_layers, n_heads=n_heads,
                  n_kv_heads=n_kv_heads, ff_dim=ff_dim,
                  base_vocab=base_vocab, max_len=max_len + C + 1,
                  num_codebooks=num_codebooks, codebook_size=codebook_size,
                  lora_rank=lora_rank if use_lora else 0,
                  lora_alpha=lora_alpha, remat=remat,
                  backbone_path=backbone)
    # explicit sample-list override: head-to-head parity feeds both sides
    # the identical prompt/response strings
    if train_samples is None or eval_samples is None:
        gen = LCRecTaskGenerator(corpus, sem_ids, item_titles=titles,
                                 item_descriptions=descs,
                                 max_seq_len=max_seq_len, seed=seed)
        if train_samples is None:
            train_samples = gen.generate("train",
                                         max_samples=max_train_samples)
        if eval_samples is None:
            eval_samples = gen.generate("test", max_samples=max_eval_samples)
            # grounding-task eval sets: per-item enumeration ×3 subtypes
            # (reference amazon_lcrec.py:393-429; its eval loop scores any
            # task present, trainers/lcrec_trainer.py:192-239)
            for t in eval_tasks:
                if t in ("item2index", "index2item"):
                    eval_samples = eval_samples + gen.generate_item_eval(
                        t, max_items=eval_max_items_per_task)
    logger.info("samples: train=%d eval=%d vocab=%d", len(train_samples),
                len(eval_samples), len(model.tokenizer))

    rng = jax.random.PRNGKey(seed)
    if pretrained_backbone_path:
        loaded, params = LCRec.load_pretrained(pretrained_backbone_path)
        if len(loaded.tokenizer) != len(model.tokenizer):
            raise ValueError("pretrained backbone vocab mismatch")
        logger.info("loaded pretrained backbone from %s",
                    pretrained_backbone_path)
    else:
        params = model.init_params(rng)
        if backbone:
            logger.info("loaded converted Qwen2 backbone from %s", backbone)
        elif use_lora:
            logger.warning(
                "use_lora=True with a randomly-initialized backbone: "
                "freezing random base weights is almost never what you "
                "want — set backbone=<converted-qwen2 dir> (LoRA exists "
                "to adapt a pretrained model).")
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    def batch_fn_train(samples):
        return sft_collate(model, samples, max_len)

    eval_len = eval_max_len or max_len
    def batch_fn_eval(samples):
        return eval_collate(model, samples, eval_len)

    pidx, pcnt = jax.process_index(), jax.process_count()

    def iter_batches(samples, bs, batch_fn, shuffle, seed_):
        from genrec_tpu.data import Loader
        return Loader(samples, bs, batch_fn, shuffle=shuffle, seed=seed_,
                      process_index=pidx, process_count=pcnt)

    total_steps = epochs * max(len(train_samples) // batch_size, 1)
    schedule = make_schedule(name="cosine_warmup",
                             learning_rate=learning_rate,
                             num_warmup_steps=num_warmup_steps,
                             total_steps=total_steps)
    tx = make_optimizer(schedule, optimizer="adamw",
                        weight_decay=weight_decay, grad_clip_norm=1.0)
    trainable_mask = None
    if use_lora:
        # peft parity: only the low-rank adapters train. The freeze is an
        # Engine-level trainable/frozen split (grads + Adam state exist for
        # the adapters alone), not an optax mask — at a Qwen2.5-class
        # backbone the full-tree fp32 grad pytree would not fit one chip.
        from genrec_tpu.models.llm import lora_label_fn, lora_param_mask
        lora_label_fn(params)   # raises early if no adapters exist
        trainable_mask = lora_param_mask(params)

    shard_batch_fn = None
    engine_shard_params = "fsdp" if fsdp else False
    pp_export = None
    if vocab_parallel_ce:
        # Megatron-style loss: the (V, D) token table stays row-sharded
        # over the model axis; logsumexp stats combine via psum/pmax —
        # the table is never all-gathered (ops/fused_ce.py)
        if not model.model.tie_embeddings:
            raise ValueError("vocab_parallel_ce requires tied embeddings")
        from genrec_tpu.ops.fused_ce import make_vocab_parallel_ce
        vp_ce = make_vocab_parallel_ce(mesh)

        def loss_fn(params, batch, rng):
            h = model.model.apply(
                {"params": params}, batch["input_ids"],
                batch["attention_mask"], method="hidden_states")
            xs = h[:, :-1, :].reshape(-1, h.shape[-1])
            ls = batch["labels"][:, 1:].reshape(-1)
            return vp_ce(xs, params["wte"], ls), {}
    elif pipeline_parallelism > 1:
        # GPipe: layer stack sharded over the pipe axis, microbatched
        # shard_map schedule (parallel/pipeline.py) — layer params + their
        # grads/Adam state live on 1/pipe of the chips
        from genrec_tpu.parallel import (PipelinedLM, from_pipeline_params,
                                         pipeline_param_shardings,
                                         to_pipeline_params)
        plm = PipelinedLM(model.model, mesh, n_micro=pp_microbatches)
        params = to_pipeline_params(params, model.model.n_layers)
        engine_shard_params = pipeline_param_shardings(mesh, params)
        pp_export = from_pipeline_params
        if trainable_mask is not None:
            # re-derive the LoRA mask on the stacked layout (leaf names
            # are preserved by stacking)
            from genrec_tpu.models.llm import lora_param_mask
            trainable_mask = lora_param_mask(params)

        def loss_fn(params, batch, rng):
            return plm.loss(params, batch["input_ids"],
                            batch["attention_mask"], batch["labels"]), {}
    elif sequence_parallelism:
        # ring attention: activations shard (batch, sequence) over
        # (data, model); attention rotates k/v blocks over ICI
        # (parallel/ring.py)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from genrec_tpu.parallel.ring import SequenceParallelLM
        splm = SequenceParallelLM(model.model, mesh)
        sp2 = NamedSharding(mesh, P("data", "model"))
        sp1 = NamedSharding(mesh, P("data"))

        def shard_batch_fn(batch):
            return {k: jax.device_put(np.asarray(v),
                                      sp2 if np.ndim(v) == 2 else sp1)
                    for k, v in batch.items()}

        def loss_fn(params, batch, rng):
            return splm.loss(params, batch["input_ids"],
                             batch["attention_mask"], batch["labels"]), {}
    else:
        def loss_fn(params, batch, rng):
            out = model.apply(params, batch["input_ids"],
                              attention_mask=batch["attention_mask"],
                              labels=batch["labels"])
            return out.loss, {}

    # fsdp: ZeRO-3 placement of the backbone over the data axis — the
    # memory path for full fine-tuning (param/grad/Adam scale 1/N chips)
    engine = Engine(mesh, loss_fn, tx, params, rng=rng,
                    shard_params=engine_shard_params,
                    trainable_mask=trainable_mask,
                    shard_batch_fn=shard_batch_fn)

    def export_params():
        """Plain CausalLM layout for generation/persistence (PP stores the
        stacked-layer layout)."""
        p = engine.full_params
        return pp_export(p) if pp_export is not None else p
    mlogger = MetricLogger(save_dir_root, wandb_project, wandb_logging,
                           enabled=pidx == 0)
    generate = model.make_generate_topk(
        num_beams=num_beams,
        valid_item_ids=sem_ids[:corpus.num_items]
        if use_item_trie else None)
    # grounding-task decoders, built lazily (each is its own compiled
    # program; seqrec-only evals never pay for them)
    generate_greedy = generate_text = None
    if any(s.get("task") == "item2index" for s in eval_samples):
        generate_greedy = model.make_generate_topk(num_beams=1)
    if any(s.get("task") == "index2item" for s in eval_samples):
        generate_text = model.make_generate_text(max_new_tokens=50)
    acc = TopKAccumulator(ks=EVAL_KS)

    from genrec_tpu.ops.metrics import sem_id_detail_sums
    catalog = jnp.asarray(sem_ids[:corpus.num_items], jnp.int32)

    def _acc_detail(detail: dict, dsums: dict) -> None:
        for k, v in dsums.items():
            detail[k] = detail.get(k, 0.0) + float(np.asarray(v))

    def evaluate() -> dict:
        # reference eval depth (lcrec_trainer.py:131-260): seqrec R@K/NDCG
        # + per-codebook top-1 accuracy / exact-match / invalid counts;
        # item2index greedy-constrained exact + per-codebook; index2item
        # free-text substring match. Task sections mirror the reference's
        # ``{task}_exact`` / ``{task}_c{i}`` / ``index2item_match`` keys.
        by_task: dict = {}
        for s in eval_samples:
            by_task.setdefault(s.get("task", "seqrec"), []).append(s)
        acc.reset()
        detail: dict = {}
        ebs = eval_batch_size or batch_size
        ep = export_params()   # hoisted: PP layout export is per-eval, not
        for batch in iter_batches(by_task.get("seqrec", []), ebs,  # per-batch
                                  batch_fn_eval, False, 0):
            db = shard_batch(batch, mesh)
            out = generate(ep, db["input_ids"], db["attention_mask"])
            sums = topk_metric_sums(db["target_sem_ids"], out.sem_ids,
                                    EVAL_KS, valid=db["valid"])
            acc.update_sums({k: float(np.asarray(v))
                             for k, v in sums.items()})
            _acc_detail(detail, sem_id_detail_sums(
                db["target_sem_ids"], out.sem_ids[:, 0], valid=db["valid"],
                catalog_codes=catalog, codebook_size=codebook_size))
        m = acc.reduce()
        n = max(detail.pop("count", 0.0), 1.0)
        for k, v in detail.items():
            m[k.replace("_sum", "")] = v / n

        if by_task.get("item2index"):
            # reference: greedy constrained decode, per-codebook + exact
            # (lcrec_trainer.py:192-214). Its denominator drops rows whose
            # output fails to parse; the compiled constrained decode emits
            # per-level-legal tokens by construction, so every row counts
            # (equivalent-or-stricter denominator).
            d2: dict = {}
            for batch in iter_batches(by_task["item2index"], ebs,
                                      batch_fn_eval, False, 0):
                db = shard_batch(batch, mesh)
                out = generate_greedy(ep, db["input_ids"],
                                      db["attention_mask"])
                _acc_detail(d2, sem_id_detail_sums(
                    db["target_sem_ids"], out.sem_ids[:, 0],
                    valid=db["valid"]))
            n2 = max(d2.pop("count", 0.0), 1.0)
            m["item2index_exact"] = d2.pop("exact_match_sum", 0.0) / n2
            for k, v in d2.items():
                level = k.split("@")[-1]
                m[f"item2index_c{level}"] = v / n2

        if by_task.get("index2item"):
            # reference: unconstrained greedy ≤50 tokens, lowercase
            # substring match of the target text (lcrec_trainer.py:215-223)
            # text matching is host-side: row r of batch b maps back to
            # sample b·ebs + pidx + r·pcnt (Loader's strided multi-host
            # slicing, shuffle off); each host scores its local shard
            matched = total = 0
            samples_i = by_task["index2item"]
            for b, batch in enumerate(iter_batches(samples_i, ebs,
                                                   batch_fn_eval, False, 0)):
                db = shard_batch(batch, mesh)
                toks = np.asarray(
                    generate_text(ep, db["input_ids"],
                                  db["attention_mask"]))
                valid = np.asarray(batch["valid"])
                for r in range(toks.shape[0]):
                    gi = b * ebs + pidx + r * pcnt
                    if not valid[r] or gi >= len(samples_i):
                        continue
                    tgt = samples_i[gi]["response"].strip().lower()
                    gen_text = model.tokenizer.decode(
                        toks[r]).strip().lower()
                    total += 1
                    if tgt and gen_text and tgt in gen_text:
                        matched += 1
            m["index2item_match"] = matched / max(total, 1)
        return m

    if eval_only:
        m = evaluate()
        logger.info("eval-only: %s", {k: round(v, 4) for k, v in m.items()})
        return m

    from genrec_tpu.core.preemption import PreemptionGuard
    guard = PreemptionGuard()
    timer = StepTimer()
    for epoch in range(epochs):
        for i, batch in enumerate(iter_batches(
                train_samples, batch_size, batch_fn_train, True,
                seed + epoch)):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            metrics = engine.run_step(batch)
            timer.tick(batch["input_ids"].shape[0])
            if engine.step % wandb_log_interval == 0:
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                mlogger.log(host, engine.step)
                if not np.isfinite(host["loss"]):
                    raise RuntimeError(
                        f"non-finite loss {host['loss']} at step "
                        f"{engine.step} — halting (failure detection)")
            if guard.should_stop():
                logger.warning("preemption signal: saving HF checkpoint at "
                               "step %d and exiting", engine.step)
                model.save_pretrained(
                    os.path.join(save_dir_root, "hf_ckpt"),
                    export_params())
                mlogger.close()
                return {"preempted_at_step": engine.step}
        logger.info("epoch %d: loss=%.4f (%.0f ex/s)", epoch,
                    float(np.asarray(metrics["loss"])),
                    timer.examples_per_sec)
        if do_eval and (epoch + 1) % eval_every_epoch == 0:
            m = evaluate()
            mlogger.log(m, engine.step, section="eval")
            logger.info("epoch %d eval: %s", epoch,
                        {k: round(v, 4) for k, v in m.items()})
        if (epoch + 1) % save_every_epoch == 0:
            model.save_pretrained(os.path.join(save_dir_root, "hf_ckpt"),
                                  export_params())

    final = evaluate()
    logger.info("final: %s", {k: round(v, 4) for k, v in final.items()})
    model.save_pretrained(os.path.join(save_dir_root, "hf_ckpt"),
                          export_params())
    mlogger.close()
    return final


if __name__ == "__main__":
    parse_config()
    train()
