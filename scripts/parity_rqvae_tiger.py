"""RQ-VAE and TIGER head-to-head parity runs (see reference_parity.py).

RQ-VAE: both sides train on the identical synthetic 768-d catalog with the
reference recipe (``/root/reference/config/tiger/amazon/rqvae.gin:9-28``:
AdamW lr 1e-3 wd 1e-4, B=1024, linear warmup, grad-clip 1.0, gumbel_t 0.2,
k-means megabatch init, STE + Sinkhorn-last, 3x256 codebooks, 95/5 item
split seed 42). Compared: eval-split total/reconstruction loss and the
collision rate over all items.

TIGER: both sides consume the SAME semantic-ID table (produced by the
genrec_tpu RQ-VAE parity artifact) so stage-2 quality is isolated from
stage-1 randomness, with the reference training recipe
(``tiger_trainer.py:216-331``: AdamW + cosine warmup, grad-clip 1.0) at the
synthetic-scale architecture, trie-constrained beam-10 eval on the test
split.
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.reference_parity import (CORPUS, OUT_DIR, append_run,
                                      bind_tpu_corpus, install_reference,
                                      make_shared_corpus)

RQVAE_EPOCHS = 2000          # 5000 in the reference config; the synthetic
                             # catalog converges far earlier (2 steps/epoch)
TIGER_CFG = dict(embedding_dim=64, attn_dim=96, dropout=0.1, num_heads=4,
                 n_layers=4, num_item_embeddings=256,
                 num_user_embeddings=10000, sem_id_dim=3, max_seq_len=20)
# the reference's host-side beam merge makes its CPU eval ~O(users); a
# smaller user count keeps the head-to-head within budget (same corpus on
# both sides; binomial noise at 1500 eval rows ~ +-0.008)
TIGER_USERS = 1500


def _item_split(emb: np.ndarray):
    """The shared 95/5 item split (reference amazon.py:221-233, seed 42)."""
    split_rng = np.random.default_rng(42)
    is_train = split_rng.random(len(emb)) > 0.05
    return emb[is_train], emb[~is_train]


# ------------------------------------------------------------------ RQ-VAE

def run_reference_rqvae(catalog, seed: int, epochs: int) -> dict:
    import torch
    install_reference()
    import torch._dynamo
    torch._dynamo.config.suppress_errors = True  # CPU fallback for the
    # @torch.compile(reduce-overhead) on RqVae.forward
    from transformers import get_linear_schedule_with_warmup

    from genrec.models.rqvae import QuantizeForwardMode, RqVae

    emb = np.asarray(catalog.embeddings, np.float32)
    train_emb, eval_emb = _item_split(emb)
    torch.manual_seed(seed)
    model = RqVae(input_dim=768, embed_dim=32,
                  hidden_dims=[512, 256, 128, 64], codebook_size=256,
                  codebook_kmeans_init=True, codebook_normalize=False,
                  codebook_sim_vq=False,
                  codebook_mode=QuantizeForwardMode.STE,
                  codebook_last_layer_mode=QuantizeForwardMode.SINKHORN,
                  n_layers=3, n_cat_features=0, commitment_weight=0.25)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
    B = 1024
    steps_per_epoch = math.ceil(len(train_emb) / B)
    sched = get_linear_schedule_with_warmup(
        opt, num_warmup_steps=50 * steps_per_epoch,
        num_training_steps=epochs * steps_per_epoch)

    t_train = torch.as_tensor(train_emb)
    t_all = torch.as_tensor(emb)
    # k-means warmup on the (single, <20k) megabatch — rqvae_trainer.py:218-228
    model(t_train, 0.2)
    g = np.random.default_rng(seed)
    t0 = time.time()
    for epoch in range(epochs):
        order = g.permutation(len(train_emb))
        model.train()
        for s in range(steps_per_epoch):
            data = t_train[order[s * B:(s + 1) * B]]
            opt.zero_grad()
            out = model(data, gumbel_t=0.2)
            out.loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            sched.step()
        if (epoch + 1) % 500 == 0:
            print(f"  [ref rqvae seed {seed}] epoch {epoch + 1} "
                  f"loss={out.loss.item():.4f}", flush=True)
    model.eval()
    with torch.no_grad():
        ev = model(torch.as_tensor(eval_emb), gumbel_t=0.2)
        ids = model.get_semantic_ids(t_all, gumbel_t=0.001).sem_ids.numpy()
    uniq = len({tuple(r) for r in ids.tolist()})
    return {"side": "reference", "model": "rqvae", "seed": seed,
            "epochs": epochs,
            "eval_loss": float(ev.loss),
            "eval_recon_loss": float(ev.reconstruction_loss),
            "collision_rate_all": 1.0 - uniq / len(ids),
            "train_seconds": round(time.time() - t0, 1)}


def run_tpu_rqvae(seed: int, epochs: int, out_suffix: str = "") -> dict:
    import jax
    import jax.numpy as jnp

    from genrec_tpu.core.checkpoint import load_rqvae_artifact
    from genrec_tpu.models.rqvae import RqVae
    from genrec_tpu.trainers.rqvae_trainer import train

    bind_tpu_corpus()
    # out_suffix keeps re-runs (e.g. post-sinkhorn-fix "_sk2") from
    # overwriting the artifact an earlier TIGER table was built from
    out_dir = os.path.join(OUT_DIR, f"rqvae_tpu_{seed}{out_suffix}")
    t0 = time.time()
    res = train(epochs=epochs, dataset_type="synthetic",
                eval_every=max(epochs // 4, 1),
                save_model_every=10 ** 9, save_dir_root=out_dir,
                wandb_logging=False, seed=seed)
    params, cfg, sem_ids = load_rqvae_artifact(res["artifact_dir"])
    model = RqVae(input_dim=cfg["input_dim"], embed_dim=cfg["embed_dim"],
                  hidden_dims=tuple(cfg["hidden_dims"]),
                  codebook_size=cfg["codebook_size"],
                  n_layers=cfg["n_layers"])
    _, eval_emb = _item_split(
        np.asarray(make_shared_corpus()[0].embeddings, np.float32))
    out = model.apply({"params": params}, jnp.asarray(eval_emb),
                      gumbel_t=0.2, train=False)
    return {"side": "genrec_tpu", "model": "rqvae", "seed": seed,
            "epochs": epochs,
            "eval_loss": float(out.loss),
            "eval_recon_loss": float(out.reconstruction_loss),
            "collision_rate_all": float(res["collision_rate"]),
            "train_seconds": round(time.time() - t0, 1),
            "artifact_dir": res["artifact_dir"]}


# ------------------------------------------------------------------- TIGER

def shared_sem_ids(epochs: int) -> np.ndarray:
    """One semantic-ID table for BOTH tiger sides (from the seed-100
    genrec_tpu rqvae parity artifact; built on demand)."""
    from genrec_tpu.core.checkpoint import load_rqvae_artifact
    art = os.path.join(OUT_DIR, "rqvae_tpu_100", "artifact")
    if not os.path.exists(os.path.join(art, "rqvae.json")):
        print("building shared RQ-VAE artifact (seed 100)...", flush=True)
        run_tpu_rqvae(100, epochs=RQVAE_EPOCHS)
    _, _, sem_ids = load_rqvae_artifact(art)
    # TIGER vocab is 256 codes/level (TIGER_CFG); table values already fit
    return np.asarray(sem_ids, np.int64)


def run_reference_tiger(corpus, sem_ids: np.ndarray, seed: int,
                        epochs: int) -> dict:
    import torch
    from torch.utils.data import DataLoader
    install_reference()
    from transformers import get_cosine_schedule_with_warmup

    from genrec.data.schemas import SeqData
    from genrec.models.tiger import Tiger
    from genrec.modules.metrics import TopKAccumulator
    from genrec.trainers.tiger_trainer import pad_collate

    C = sem_ids.shape[1]
    max_hist = TIGER_CFG["max_seq_len"]

    def to_seqdata(sample):
        hist = sample.history[-max_hist:]
        flat = [int(c) for i in hist for c in sem_ids[i]]
        return SeqData(user_id=sample.user_id, item_ids=flat,
                       target_ids=[int(c) for c in sem_ids[sample.target]])

    splits = {s: [to_seqdata(x) for x in corpus.generate_samples(s)]
              for s in ("train", "valid", "test")}
    pad_id = TIGER_CFG["num_item_embeddings"] * C
    collate = lambda b: pad_collate(b, pad_id=pad_id)
    g = torch.Generator()
    g.manual_seed(seed)
    train_dl = DataLoader(splits["train"], batch_size=128, shuffle=True,
                          collate_fn=collate, generator=g)
    eval_dls = {s: DataLoader(splits[s], batch_size=128, shuffle=False,
                              collate_fn=collate) for s in ("valid", "test")}

    torch.manual_seed(seed)
    model = Tiger(embedding_dim=TIGER_CFG["embedding_dim"],
                  attn_dim=TIGER_CFG["attn_dim"],
                  dropout=TIGER_CFG["dropout"],
                  num_heads=TIGER_CFG["num_heads"],
                  n_layers=TIGER_CFG["n_layers"],
                  num_item_embeddings=TIGER_CFG["num_item_embeddings"],
                  num_user_embeddings=TIGER_CFG["num_user_embeddings"],
                  sem_id_dim=C, max_pos=max_hist * C)
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4, weight_decay=0.035)
    total = len(train_dl) * epochs
    sched = get_cosine_schedule_with_warmup(opt, num_warmup_steps=20,
                                            num_training_steps=total)
    valid_item_ids = torch.as_tensor(sem_ids, dtype=torch.long)

    def evaluate(dl):
        acc = TopKAccumulator(ks=[1, 5, 10])
        model.eval()
        for data in dl:
            with torch.inference_mode():
                gen = model.generate(
                    user_input_ids=data["user_input_ids"],
                    item_input_ids=data["item_input_ids"],
                    token_type_ids=data["token_type_ids"],
                    seq_mask=data["seq_mask"],
                    valid_item_ids=valid_item_ids)
            acc.accumulate(actual=data["target_input_ids"],
                           top_k=gen.sem_ids)
        return acc.reduce()

    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        for data in train_dl:
            out = model(
                user_input_ids=data["user_input_ids"],
                item_input_ids=data["item_input_ids"],
                token_type_ids=data["token_type_ids"],
                target_input_ids=data["target_input_ids"],
                target_token_type_ids=data["target_token_type_ids"],
                seq_mask=data["seq_mask"])
            out.loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            sched.step()
            opt.zero_grad()
        print(f"  [ref tiger seed {seed}] epoch {epoch} "
              f"loss={out.loss.item():.4f} ({time.time() - t0:.0f}s)",
              flush=True)
    test_m = evaluate(eval_dls["test"])
    metrics = {f"Recall@{k}": test_m[f"Recall@{k}"] for k in (1, 5, 10)
               if f"Recall@{k}" in test_m}
    metrics.update({f"NDCG@{k}": test_m[f"NDCG@{k}"] for k in (1, 5, 10)
                    if f"NDCG@{k}" in test_m})
    return {"side": "reference", "model": "tiger", "seed": seed,
            "epochs": epochs, "train_seconds": round(time.time() - t0, 1),
            **metrics}


def run_tpu_tiger(sem_ids: np.ndarray, seed: int, epochs: int) -> dict:
    from genrec_tpu.trainers.tiger_trainer import train
    bind_tpu_corpus(n_users=TIGER_USERS)
    t0 = time.time()
    m = train(epochs=epochs, learning_rate=3e-4, weight_decay=0.035,
              num_warmup_steps=20,
              batch_size=128, dataset_type="synthetic",
              sem_ids_table=sem_ids, num_beams=10,
              eval_valid_every_epoch=10 ** 9, eval_test_every_epoch=10 ** 9,
              save_every_epoch=10 ** 9,
              save_dir_root=f"/tmp/parity_tiger_{seed}",
              wandb_logging=False, seed=seed, **TIGER_CFG)
    return {"side": "genrec_tpu", "model": "tiger", "seed": seed,
            "epochs": epochs, "train_seconds": round(time.time() - t0, 1),
            **{k: float(v) for k, v in m.items()}}


def run_model(args) -> None:
    if args.model == "rqvae":
        catalog, _ = make_shared_corpus()
        epochs = args.epochs if args.epochs != 10 else RQVAE_EPOCHS
        for s in range(args.seed_base, args.seed_base + args.seeds):
            if args.side in ("both", "genrec_tpu"):
                append_run("rqvae", run_tpu_rqvae(s, epochs))
            if args.side in ("both", "reference"):
                append_run("rqvae", run_reference_rqvae(catalog, s, epochs))
    else:
        _, corpus = make_shared_corpus(n_users=TIGER_USERS)
        sem_ids = shared_sem_ids(RQVAE_EPOCHS)
        for s in range(args.seed_base, args.seed_base + args.seeds):
            if args.side in ("both", "genrec_tpu"):
                append_run("tiger", run_tpu_tiger(sem_ids, s, args.epochs))
            if args.side in ("both", "reference"):
                append_run("tiger",
                           run_reference_tiger(corpus, sem_ids, s,
                                               args.epochs))
