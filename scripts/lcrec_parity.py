"""LCRec head-to-head quality parity: reference (torch+HF) vs genrec_tpu.

VERDICT r3 missing #2 / next #3: a ``Qwen2Config``-from-scratch tiny
backbone needs no downloads (torch + transformers are installed), so the
reference's own ``LCRec`` (``/root/reference/genrec/models/lcrec.py:17-243``)
and SFT + constrained-decode eval loop
(``trainers/lcrec_trainer.py:43-260``) can run head-to-head against
genrec_tpu's CausalLM. Both sides:

  - start from IDENTICAL weights — the reference side builds the tiny
    Qwen2 (+ codebook-token surgery/resize), saves an HF checkpoint, and
    ``interop.convert_qwen2_checkpoint`` turns it into the genrec_tpu
    backbone artifact (the converter is logits-parity-tested in
    tests/test_interop.py);
  - share ONE locally-trained BPE tokenizer (``tokenizers`` pip package;
    reference wraps it in ``PreTrainedTokenizerFast``, genrec_tpu in
    ``HFTokenizerAdapter`` — same tokenizer.json, same ids);
  - consume the IDENTICAL SFT sample list (task-mixed train, seqrec-only
    eval, reference ``amazon_lcrec.py:432-454`` semantics) rendered once
    from the shared synthetic corpus + shared semantic-ID table;
  - train with the reference recipe (AdamW, cosine warmup, grad-clip 1.0,
    prompt-masked labels) and eval with beam-10 constrained decoding
    (reference: HF ``generate`` + ``prefix_allowed_tokens_fn``; genrec_tpu:
    its jit KV-cache beam), scoring Recall/NDCG@{1,5,10} over semantic-ID
    tuples identically.

Run (CPU): env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/lcrec_parity.py --side both --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.reference_parity import (CORPUS, OUT_DIR, append_run,
                                      bind_tpu_corpus, install_reference,
                                      make_shared_corpus)
from scripts.parity_rqvae_tiger import shared_sem_ids, RQVAE_EPOCHS

N_USERS = 1500            # same reduced corpus as the TIGER head-to-head
C, K_CODE = 3, 256        # the shared parity sem-id table is 3x256
MAX_HIST = 10
MAX_LEN = 256
EVAL_KS = (1, 5, 10)
ARCH = dict(d_model=128, n_layers=2, n_heads=4, n_kv_heads=2, ff_dim=352)
# Recipe notes: the reference's production recipe fine-tunes a PRETRAINED
# Qwen2.5-1.5B on the 6-task mix; a from-scratch tiny backbone on that
# diet scores exactly 0 R@10 after 3 epochs on BOTH sides (measured —
# the 256^3 code space can't be learned from ~2k seqrec samples), which
# makes the head-to-head uninformative. The shared synthetic-scale recipe
# therefore trains seqrec-only with the full sliding-window sample set —
# identical on both sides, so the comparison stays fair while the metric
# carries signal (the same adaptation TIGER_CFG makes for its table).
RECIPE = dict(batch_size=16, learning_rate=3e-4, weight_decay=0.01,
              num_beams=10, max_train_samples=8000)
SEQREC_ONLY = True
TOK_DIR = os.path.join(OUT_DIR, "lcrec_tok")


def build_tokenizer() -> str:
    """One deterministic BPE for both sides (saved under out/parity)."""
    path = os.path.join(TOK_DIR, "tokenizer.json")
    if os.path.exists(path):
        return path
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from genrec_tpu.data.lcrec import TEMPLATES, SFT_PROMPT
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=800, special_tokens=["<pad>", "<unk>", "<eos>"])
    corpus_text = [SFT_PROMPT]
    for bank in TEMPLATES.values():
        corpus_text.extend(bank)
    corpus_text += [f"synthetic item {i} cluster c{i % 31}"
                    for i in range(0, 2000, 7)]
    corpus_text += ["1. 2. 3. 4. 5. 6. 7. 8. 9. 10."]
    tok.train_from_iterator(corpus_text, trainer)
    os.makedirs(TOK_DIR, exist_ok=True)
    tok.save(path)
    return path


def shared_samples(sem_ids):
    """One SFT sample list for both sides (genrec_tpu's generator renders
    the prompt/response strings; the reference side consumes the same
    dicts through its own collate)."""
    from genrec_tpu.data.lcrec import LCRecTaskGenerator
    _, corpus = make_shared_corpus(n_users=N_USERS)
    titles = [f"synthetic item {i} cluster c{i % 31}"
              for i in range(corpus.num_items)]
    gen = LCRecTaskGenerator(corpus, sem_ids, item_titles=titles,
                             max_seq_len=MAX_HIST,
                             enabled_tasks=(("seqrec",) if SEQREC_ONLY
                                            else None), seed=0)
    train = gen.generate("train",
                         max_samples=RECIPE["max_train_samples"])
    test = gen.generate("test")
    return train, test


def backbone_dirs(seed: int):
    hf_dir = os.path.join(OUT_DIR, f"lcrec_hf_{seed}")
    art_dir = os.path.join(OUT_DIR, f"lcrec_backbone_{seed}")
    return hf_dir, art_dir


def build_reference_model(seed: int, tok_path: str):
    """Tiny Qwen2 + shared tokenizer + codebook surgery, reference-style."""
    import torch
    from tokenizers import Tokenizer
    from transformers import PreTrainedTokenizerFast, Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    install_reference()
    from genrec.models.lcrec import LCRec

    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=Tokenizer.from_file(tok_path),
        eos_token="<eos>", pad_token="<pad>", unk_token="<unk>")
    torch.manual_seed(seed)
    cfg = Qwen2Config(
        vocab_size=len(hf_tok), hidden_size=ARCH["d_model"],
        intermediate_size=ARCH["ff_dim"],
        num_hidden_layers=ARCH["n_layers"],
        num_attention_heads=ARCH["n_heads"],
        num_key_value_heads=ARCH["n_kv_heads"],
        max_position_embeddings=MAX_LEN + C + 1,
        tie_word_embeddings=True,
        eos_token_id=hf_tok.eos_token_id,
        pad_token_id=hf_tok.pad_token_id)
    lc = LCRec.__new__(LCRec)
    torch.nn.Module.__init__(lc)
    lc.tokenizer = hf_tok
    lc.model = Qwen2ForCausalLM(cfg)
    lc.add_codebook_tokens(num_codebooks=C, codebook_size=K_CODE)
    return lc


def export_backbone(lc, seed: int) -> str:
    """HF checkpoint → genrec_tpu backbone artifact (identical weights)."""
    from genrec_tpu.interop import convert_qwen2_checkpoint
    hf_dir, art_dir = backbone_dirs(seed)
    lc.save_pretrained(hf_dir)
    convert_qwen2_checkpoint(hf_dir, art_dir)
    return art_dir


# ---------------------------------------------------------------- reference

def run_reference(train_ds, test_ds, seed: int, epochs: int) -> dict:
    import torch
    from torch.utils.data import DataLoader
    install_reference()
    from transformers import get_cosine_schedule_with_warmup
    from genrec.trainers.lcrec_trainer import (ConstrainedDecodingHelper,
                                               lcrec_collate_fn)
    from genrec.modules.metrics import TopKAccumulator

    lc = build_reference_model(seed, build_tokenizer())
    export_backbone(lc, seed)       # the jax side consumes this artifact
    tokenizer = lc.tokenizer
    helper = ConstrainedDecodingHelper(C, K_CODE, tokenizer)

    g = torch.Generator()
    g.manual_seed(seed)
    train_dl = DataLoader(
        train_ds, batch_size=RECIPE["batch_size"], drop_last=True,
        shuffle=True, generator=g,
        collate_fn=lambda x: lcrec_collate_fn(x, tokenizer, MAX_LEN, C,
                                              is_eval=False))
    test_dl = DataLoader(
        test_ds, batch_size=32, shuffle=False,
        collate_fn=lambda x: lcrec_collate_fn(x, tokenizer, MAX_LEN, C,
                                              is_eval=True))

    opt = torch.optim.AdamW(lc.parameters(), lr=RECIPE["learning_rate"],
                            weight_decay=RECIPE["weight_decay"])
    total = len(train_dl) * epochs
    sched = get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=max(int(total * 0.01), 1),
        num_training_steps=total)

    t0 = time.time()
    for epoch in range(epochs):
        lc.train()
        for data in train_dl:
            out = lc(input_ids=data["input_ids"],
                     attention_mask=data["attention_mask"],
                     labels=data["labels"])
            out.loss.backward()
            torch.nn.utils.clip_grad_norm_(lc.parameters(), 1.0)
            opt.step()
            sched.step()
            opt.zero_grad()
        print(f"  [ref lcrec seed {seed}] epoch {epoch} "
              f"loss={float(out.loss):.4f} ({time.time() - t0:.0f}s)",
              flush=True)

    # seqrec eval: reference evaluate() (lcrec_trainer.py:131-239) —
    # beam-10 constrained HF generate, <Ci_j> regex parse, TopKAccumulator
    lc.eval()
    beam = RECIPE["num_beams"]
    prefix_fn = helper.get_prefix_allowed_tokens_fn()
    acc = TopKAccumulator(ks=list(EVAL_KS))
    exact = total_rows = 0
    with torch.no_grad():
        for data in test_dl:
            inp, attn = data["input_ids"], data["attention_mask"]
            gen = lc.model.generate(
                input_ids=inp, attention_mask=attn,
                max_new_tokens=C + 1, do_sample=False,
                num_beams=beam, num_return_sequences=beam,
                pad_token_id=tokenizer.pad_token_id,
                eos_token_id=tokenizer.eos_token_id, early_stopping=True,
                use_cache=True, prefix_allowed_tokens_fn=prefix_fn)
            inp_len = inp.size(1)
            for i in range(inp.size(0)):
                target = data["target_sem_ids"][i].tolist()
                preds = []
                for k in range(beam):
                    idx = i * beam + k
                    sem = helper.extract_sem_ids(tokenizer.decode(
                        gen[idx, inp_len:], skip_special_tokens=False))
                    if sem:
                        preds.append(sem)
                while len(preds) < beam:
                    preds.append([0] * C)
                exact += int(preds[0] == target)
                total_rows += 1
                acc.accumulate(torch.tensor([target]),
                               torch.tensor([preds]))
    m = acc.reduce()
    metrics = {k: float(v) for k, v in m.items()
               if k.split("@")[0] in ("Recall", "NDCG")}
    metrics["exact_match"] = exact / max(total_rows, 1)
    return {"side": "reference", "model": "lcrec", "seed": seed,
            "epochs": epochs, "train_seconds": round(time.time() - t0, 1),
            **metrics}


# ---------------------------------------------------------------- genrec_tpu

def run_tpu(train_samples, eval_samples, seed: int, epochs: int) -> dict:
    from genrec_tpu.trainers.lcrec_trainer import train
    _, art_dir = backbone_dirs(seed)
    if not os.path.exists(os.path.join(art_dir, "config.json")):
        # build + export the identical-weights backbone without training
        # the reference side (e.g. --side genrec_tpu resuming)
        lc = build_reference_model(seed, build_tokenizer())
        export_backbone(lc, seed)
    bind_tpu_corpus(n_users=N_USERS)
    t0 = time.time()
    m = train(epochs=epochs, dataset_type="synthetic",
              sem_ids_table=shared_sem_ids(RQVAE_EPOCHS),
              backbone=art_dir, use_lora=False,
              num_codebooks=C, codebook_size=K_CODE,
              max_len=MAX_LEN, max_seq_len=MAX_HIST,
              train_samples=train_samples, eval_samples=eval_samples,
              batch_size=RECIPE["batch_size"],
              learning_rate=RECIPE["learning_rate"],
              weight_decay=RECIPE["weight_decay"],
              num_warmup_steps=max(
                  int(len(train_samples) // RECIPE["batch_size"]
                      * epochs * 0.01), 1),
              num_beams=RECIPE["num_beams"],
              do_eval=True, eval_every_epoch=10 ** 9,
              save_every_epoch=10 ** 9,
              save_dir_root=f"/tmp/parity_lcrec_{seed}",
              wandb_logging=False, seed=seed)
    keep = {k: float(v) for k, v in m.items()
            if k.split("@")[0] in ("Recall", "NDCG") or k == "exact_match"}
    return {"side": "genrec_tpu", "model": "lcrec", "seed": seed,
            "epochs": epochs, "train_seconds": round(time.time() - t0, 1),
            **keep}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", default="both",
                    choices=["both", "reference", "genrec_tpu"])
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed-base", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--max-eval", type=int, default=1000,
                    help="cap eval rows (binomial noise ±0.01 at 1000; "
                         "constrained beam-10 eval is the CPU cost driver)")
    args = ap.parse_args()

    sem_ids = shared_sem_ids(RQVAE_EPOCHS)
    train_ds, test_ds = shared_samples(sem_ids)
    if args.max_eval:
        test_ds = test_ds[:args.max_eval]
    print(f"samples: train={len(train_ds)} test={len(test_ds)}", flush=True)
    for s in range(args.seed_base, args.seed_base + args.seeds):
        if args.side in ("both", "reference"):
            append_run("lcrec", run_reference(train_ds, test_ds, s,
                                              args.epochs))
        if args.side in ("both", "genrec_tpu"):
            append_run("lcrec", run_tpu(train_ds, test_ds, s, args.epochs))


if __name__ == "__main__":
    main()
