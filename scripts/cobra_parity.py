"""COBRA head-to-head quality parity: reference (torch) vs genrec_tpu (JAX).

VERDICT r3 missing #3 / next #4: the reference COBRA runs fully offline with
its random-init ``LightT5Encoder``
(``/root/reference/genrec/models/cobra.py:257-270``), so a head-to-head
needs no downloads. Both sides consume the IDENTICAL inputs:

  - the shared synthetic corpus (``reference_parity.CORPUS``),
  - the shared semantic-ID table (seed-100 RQ-VAE parity artifact),
  - the same cluster-correlated synthetic token matrix
    (``data/cobra.synthetic_item_tokens``) as the item "text",

with the reference training recipe (``trainers/cobra_trainer.py:92-340``:
AdamW lr 1e-4 wd 0.01, cosine warmup, grad-clip 1.0, B=64, teacher-forcing
collate that appends the target item) and the reference eval
(``beam_fusion`` n_beam=20, n_candidates=10, alpha=0.5 against recomputed
all-item dense vectors, ``:413-456``). Split semantics follow the
reference's ``AmazonCobraDataset._generate_samples``
(``data/amazon_cobra.py:168-209``): one sample per user; train target =
seq[-3], test target = seq[-1]; history truncated to the last
``MAX_HIST`` items. Metrics are item-level Recall/NDCG@{1,5,10} computed
identically on both sides.

Run (CPU): env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/cobra_parity.py --side both --seeds 3
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.reference_parity import (OUT_DIR, append_run, bind_tpu_corpus,
                                      install_reference, make_shared_corpus)
from scripts.parity_rqvae_tiger import shared_sem_ids, RQVAE_EPOCHS

MAX_HIST = 10           # history items kept (then +1 target appended)
MAX_EVAL = 1500         # test rows per side (set by --max-eval)
TEXT_LEN = 16
TEXT_VOCAB = 4096
EVAL_KS = (1, 5, 10)
CFG = dict(encoder_n_layers=1, encoder_hidden_dim=128, encoder_num_heads=4,
           id_vocab_size=256, n_codebooks=3, d_model=128,
           decoder_n_layers=4, decoder_num_heads=4, decoder_dropout=0.1,
           temperature=0.2)
RECIPE = dict(batch_size=64, learning_rate=1e-4, weight_decay=0.01,
              num_warmup_steps=50, n_beam=20, fusion_alpha=0.5)


def item_tokens() -> np.ndarray:
    from genrec_tpu.data.cobra import synthetic_item_tokens
    from scripts.reference_parity import CORPUS
    return synthetic_item_tokens(n_items=CORPUS["n_items"],
                                 n_clusters=CORPUS["n_clusters"],
                                 vocab_size=TEXT_VOCAB, text_len=TEXT_LEN,
                                 seed=CORPUS["seed"])


def split_samples(corpus):
    """Reference split semantics (amazon_cobra.py:168-209), histories
    pre-truncated to MAX_HIST so both sides see identical windows."""
    train, test = [], []
    for uid, full in zip(corpus.user_ids, corpus.sequences):
        seq = list(full[:-2])
        if len(seq) >= 2:
            train.append((uid, seq[:-1][-MAX_HIST:], seq[-1]))
        test.append((uid, list(full[:-1])[-MAX_HIST:], full[-1]))
    return train, test[:MAX_EVAL]


def item_metrics(target_items: np.ndarray, topk_items: np.ndarray) -> dict:
    """Item-level Recall/NDCG@K over (B,) targets and (B, K) predictions."""
    out = {}
    for k in EVAL_KS:
        hit = topk_items[:, :k] == target_items[:, None]
        rec = hit.any(axis=1).astype(np.float64)
        rank = np.argmax(hit, axis=1) + 1            # valid where rec==1
        ndcg = rec / np.log2(rank + 1)
        out[f"Recall@{k}"] = float(rec.mean())
        out[f"NDCG@{k}"] = float(ndcg.mean())
    return out


# ---------------------------------------------------------------- reference

def run_reference(corpus, sem_ids, tokens, seed: int, epochs: int) -> dict:
    import torch
    from torch.utils.data import DataLoader
    install_reference()
    from transformers import get_cosine_schedule_with_warmup
    from genrec.models.cobra import Cobra
    from genrec.trainers.cobra_trainer import cobra_collate_fn

    C = CFG["n_codebooks"]
    pad_id = CFG["id_vocab_size"] * C
    tok_t = torch.as_tensor(np.asarray(tokens), dtype=torch.long)

    def to_sample(uid, hist, target):
        return {
            "input_ids": [int(c) for i in hist for c in sem_ids[i]],
            "encoder_input_ids": tok_t[list(hist)],
            "target_sem_ids": [int(c) for c in sem_ids[target]],
            "target_encoder_input_ids": tok_t[[target]],
            "target_item": int(target),
        }

    train_raw, test_raw = split_samples(corpus)
    train_ds = [to_sample(*s) for s in train_raw]
    test_ds = [to_sample(*s) for s in test_raw]

    g = torch.Generator()
    g.manual_seed(seed)
    train_dl = DataLoader(
        train_ds, batch_size=RECIPE["batch_size"], shuffle=True,
        drop_last=True, generator=g,
        collate_fn=lambda x: cobra_collate_fn(x, pad_id=pad_id,
                                              n_codebooks=C, is_train=True))
    test_dl = DataLoader(
        test_ds, batch_size=128, shuffle=False,
        collate_fn=lambda x: cobra_collate_fn(x, pad_id=pad_id,
                                              n_codebooks=C, is_train=False))

    torch.manual_seed(seed)
    model = Cobra(encoder_vocab_size=TEXT_VOCAB, max_len=1024,
                  queue_size=1024, encoder_type="light", **CFG)
    opt = torch.optim.AdamW(model.parameters(),
                            lr=RECIPE["learning_rate"],
                            weight_decay=RECIPE["weight_decay"])
    total = len(train_dl) * epochs
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=RECIPE["num_warmup_steps"],
        num_training_steps=total)

    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        for data in train_dl:
            out = model(input_ids=data["input_ids"],
                        encoder_input_ids=data["encoder_input_ids"])
            loss = out.loss_sparse + out.loss_dense
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            sched.step()
            opt.zero_grad()
        print(f"  [ref cobra seed {seed}] epoch {epoch} "
              f"loss={float(loss):.4f} ({time.time() - t0:.0f}s)",
              flush=True)

    # eval: reference compute_item_dense_vecs (cobra_trainer.py:303-334)
    model.eval()
    vec_chunks = []
    with torch.no_grad():
        for s in range(0, len(tok_t), 256):
            v = model.encoder(tok_t[s:s + 256].unsqueeze(1)).squeeze(1)
            vec_chunks.append(torch.nn.functional.normalize(v, p=2, dim=-1))
    item_vecs = torch.cat(vec_chunks, 0)
    item_sem = torch.as_tensor(np.asarray(sem_ids), dtype=torch.long)

    targets, preds = [], []
    with torch.no_grad():
        for data in test_dl:
            gen = model.beam_fusion(
                input_ids=data["input_ids"],
                encoder_input_ids=data["encoder_input_ids"],
                item_dense_vecs=item_vecs, item_sem_ids=item_sem,
                n_candidates=max(EVAL_KS), n_beam=RECIPE["n_beam"],
                alpha=RECIPE["fusion_alpha"])
            preds.append(gen.item_ids.cpu().numpy())
    preds = np.concatenate(preds, 0)
    targets = np.asarray([s["target_item"] for s in test_ds])
    m = item_metrics(targets, preds)
    return {"side": "reference", "model": "cobra", "seed": seed,
            "epochs": epochs, "train_seconds": round(time.time() - t0, 1),
            **m}


# ---------------------------------------------------------------- genrec_tpu

def run_tpu(corpus, sem_ids, tokens, seed: int, epochs: int) -> dict:
    from genrec_tpu.data.sequences import Sample
    from genrec_tpu.trainers.cobra_trainer import train

    bind_tpu_corpus()
    train_raw, test_raw = split_samples(corpus)
    mk = lambda rows: [Sample(user_id=u, history=list(h), target=t)
                       for u, h, t in rows]
    t0 = time.time()
    m = train(epochs=epochs, dataset_type="synthetic",
              sem_ids_table=sem_ids, item_tokens_table=tokens,
              encoder_vocab_size=TEXT_VOCAB,
              max_items=MAX_HIST + 1,       # ref appends target AFTER trunc
              train_samples=mk(train_raw), eval_samples=mk(test_raw),
              do_eval=True, eval_every_epoch=10 ** 9,
              save_every_epoch=10 ** 9,
              save_dir_root=f"/tmp/parity_cobra_{seed}",
              wandb_logging=False, seed=seed,
              batch_size=RECIPE["batch_size"],
              learning_rate=RECIPE["learning_rate"],
              weight_decay=RECIPE["weight_decay"],
              num_warmup_steps=RECIPE["num_warmup_steps"],
              n_beam=RECIPE["n_beam"], fusion_alpha=RECIPE["fusion_alpha"],
              eval_batch_size=256,
              # dedupe OFF for the head-to-head: with dropout active the
              # dedupe shares ONE noisy encoding across duplicate batch
              # items, so in-batch InfoNCE contains negatives IDENTICAL to
              # the positive (the reference encodes each occurrence with
              # fresh dropout noise, which breaks those ties). The
              # gradient-identity test holds only at deterministic=True;
              # production keeps dedupe for serving/eval throughput.
              dedupe_texts=False, **CFG)
    return {"side": "genrec_tpu", "model": "cobra", "seed": seed,
            "epochs": epochs, "train_seconds": round(time.time() - t0, 1),
            **{k: float(v) for k, v in m.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", default="both",
                    choices=["both", "reference", "genrec_tpu"])
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-base", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--max-eval", type=int, default=1500,
                    help="cap test rows both sides (binomial noise ±0.008; "
                         "the 20-beam fusion eval is the CPU cost driver)")
    args = ap.parse_args()

    from scripts.reference_parity import CORPUS
    _, corpus = make_shared_corpus()
    sem_ids = shared_sem_ids(RQVAE_EPOCHS)[:CORPUS["n_items"]]
    tokens = item_tokens()
    global MAX_EVAL
    MAX_EVAL = args.max_eval
    for s in range(args.seed_base, args.seed_base + args.seeds):
        if args.side in ("both", "genrec_tpu"):
            append_run("cobra", run_tpu(corpus, sem_ids, tokens, s,
                                        args.epochs))
        if args.side in ("both", "reference"):
            append_run("cobra", run_reference(corpus, sem_ids, tokens, s,
                                              args.epochs))


if __name__ == "__main__":
    main()
