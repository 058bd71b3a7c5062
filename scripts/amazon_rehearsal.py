"""Amazon dress rehearsal: the full real-data pipeline on raw-format fixtures.

One command proves the repo is one `scp` away from a real Amazon-2014 run
(VERDICT round-1 task #5, extended for round 5 with a realistic-scale mode
+ per-stage timings): it writes a raw-format dataset
(reviews_*.json.gz + meta_*.json.gz, the exact layout the reference's
download step produces — ``/root/reference/genrec/data/amazon.py:24-66``,
cache layout rehearsed per :156-233), then drives the *drop-in configs*
end to end:

    ingest → RQ-VAE (artifact) → TIGER (trie eval) → SASRec → HSTU → LCRec

with only size/epoch gin overrides — the same command lines a user would
run on the real data, minus the downloads.

Usage:
    # mechanics smoke (60 items / 40 users, tiny models, ~2 min CPU):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/amazon_rehearsal.py [workdir]

    # realistic-scale rehearsal (>=10k items / >=50k users, reference
    # model dims, 1 epoch per trainer; run on the TPU for real timings):
    python scripts/amazon_rehearsal.py --scale [workdir]

Per-stage wall-clock lands in <workdir>/rehearsal_timings.json (and is
echoed); multiply by the real epoch counts in BASELINE.md to budget a full
reproduction. Exits non-zero if any stage fails or the artifact contract
breaks.
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_fixture(root: str, n_items: int, n_users: int) -> float:
    """Raw-format corpus with clustered preferences (so models can learn).

    Returns the write wall-clock. Layout matches the reference's download
    target (``/root/reference/genrec/data/amazon.py:24-66``)."""
    t0 = time.time()
    raw = os.path.join(root, "raw", "beauty")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(0)
    n_clusters = max(8, n_items // 300)
    cluster_items = [rng.choice(n_items, size=max(8, n_items // n_clusters),
                                replace=False) for _ in range(n_clusters)]
    with gzip.open(os.path.join(raw, "reviews_Beauty_5.json.gz"), "wt") as f:
        for u in range(n_users):
            n = int(rng.integers(6, 12))
            pool = cluster_items[int(rng.integers(0, n_clusters))]
            items = rng.choice(pool, size=min(n, len(pool)), replace=False)
            t0u = 1_300_000_000 + u
            for i, item in enumerate(items):
                f.write(json.dumps({
                    "asin": f"A{item:05d}", "reviewerID": f"U{u}",
                    "unixReviewTime": t0u + i * 1000, "overall": 5.0}) + "\n")
        # coverage users: cluster draws alone leave ~1/3 of the catalog
        # unreviewed (ingest keeps only reviewed items); cycle every item
        # through 8-item synthetic users so the ingested catalog is the
        # full n_items
        perm = rng.permutation(n_items)
        for cu, start in enumerate(range(0, n_items, 8)):
            chunk = perm[start:start + 8]
            if len(chunk) < 5:          # ingest drops sequences < 5
                chunk = perm[-5:]
            t0u = 1_400_000_000 + cu
            for i, item in enumerate(chunk):
                f.write(json.dumps({
                    "asin": f"A{int(item):05d}",
                    "reviewerID": f"COV{cu}",
                    "unixReviewTime": t0u + i * 1000,
                    "overall": 5.0}) + "\n")
    with gzip.open(os.path.join(raw, "meta_Beauty.json.gz"), "wt") as f:
        for i in range(n_items):
            f.write(json.dumps({
                "asin": f"A{i:05d}", "title": f"Beauty product {i}",
                "price": 9.99, "brand": f"Brand{i % 7}",
                "categories": [["Beauty", f"Cat{i % 5}"]]}) + "\n")
    return time.time() - t0


def run(module: str, cfg: str, overrides: list[str]) -> float:
    cmd = [sys.executable, "-m", module, cfg]
    for o in overrides:
        cmd += ["--gin", o]
    print(f"\n=== {module} ===\n$ {' '.join(cmd)}", flush=True)
    # APPEND to PYTHONPATH: replacing it drops the axon sitecustomize dir
    # while JAX_PLATFORMS=axon stays set -> child backend init fails
    old_pp = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{old_pp}" if old_pp else REPO)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        print(f"STAGE FAILED: {module}", flush=True)
        sys.exit(1)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=None)
    ap.add_argument("--scale", action="store_true",
                    help="realistic scale: >=10k items, >=50k users, "
                         "reference model dims (1 epoch per trainer)")
    args = ap.parse_args()
    work = args.workdir or tempfile.mkdtemp(prefix="amazon_rehearsal_")
    data = os.path.join(work, "dataset")
    out = os.path.join(work, "out")
    timings: dict = {"mode": "scale" if args.scale else "mini"}

    n_items, n_users = (10_000, 50_000) if args.scale else (60, 40)
    timings["fixture_write_s"] = round(
        write_fixture(data, n_items, n_users), 1)
    timings["n_items"], timings["n_users"] = n_items, n_users
    print(f"fixture: {data} ({n_items} items, {n_users} users, "
          f"{timings['fixture_write_s']}s)\noutputs: {out}", flush=True)

    small = [
        f"train.dataset_folder = '{data}'",
        "train.split = 'beauty'",
    ]

    if args.scale:
        # reference dims (config/tiger/amazon/rqvae.gin, tiger.gin,
        # sasrec/amazon.gin, hstu/amazon.gin), epochs cut to 1-ish: the
        # rehearsal prices a unit of work; BASELINE.md's epoch counts
        # multiply it out
        rqvae_over = ["train.encoder_model_name = 'hashed'",
                      "train.epochs = 200", "train.warmup_epochs = 20",
                      "train.eval_every = 200",
                      f"train.save_dir_root = '{out}/rqvae'"]
        tiger_over = ["train.epochs = 1",
                      "train.eval_valid_every_epoch = 1",
                      "train.eval_test_every_epoch = 1",
                      f"train.save_dir_root = '{out}/tiger'"]
        idseq_over = ["train.epochs = 1", "train.eval_every_epoch = 1",
                      f"train.save_dir_root = '{out}/{{m}}'"]
        lcrec_over = ["train.epochs = 1",
                      # the stage-1 artifact above is 3-level (the amazon
                      # rqvae config); override the 5-level default
                      "train.num_codebooks = 3",
                      "train.max_train_samples = 2000",
                      "train.max_eval_samples = 200",
                      "train.use_lora = False",
                      f"train.save_dir_root = '{out}/lcrec'"]
        expect_levels = 3
    else:
        rqvae_over = ["train.encoder_model_name = 'hashed'",
                      "train.epochs = 30", "train.warmup_epochs = 4",
                      "train.batch_size = 32",
                      "train.vae_embed_dim = 16",
                      "train.vae_hidden_dims = (64, 32)",
                      "train.vae_codebook_size = 8",
                      "train.eval_every = 30", "train.kmeans_init_batch = 64",
                      f"train.save_dir_root = '{out}/rqvae'"]
        tiger_over = ["train.epochs = 2", "train.batch_size = 16",
                      "train.embedding_dim = 16", "train.attn_dim = 32",
                      "train.num_heads = 2", "train.n_layers = 1",
                      "train.num_item_embeddings = 8", "train.num_beams = 4",
                      "train.eval_valid_every_epoch = 2",
                      "train.eval_test_every_epoch = 2",
                      f"train.save_dir_root = '{out}/tiger'"]
        idseq_over = ["train.epochs = 2", "train.batch_size = 16",
                      "train.embed_dim = 16", "train.num_blocks = 1",
                      "train.num_heads = 1", "train.eval_every_epoch = 2",
                      f"train.save_dir_root = '{out}/{{m}}'"]
        lcrec_over = ["train.num_codebooks = 3", "train.codebook_size = 8",
                      "train.epochs = 1", "train.batch_size = 8",
                      "train.max_len = 96", "train.d_model = 32",
                      "train.n_layers = 1", "train.n_heads = 4",
                      "train.n_kv_heads = 2", "train.ff_dim = 64",
                      "train.base_vocab = 2000", "train.num_beams = 4",
                      "train.max_train_samples = 64",
                      "train.max_eval_samples = 16",
                      "train.use_lora = False",
                      f"train.save_dir_root = '{out}/lcrec'"]
        expect_levels = 3

    # 1. RQ-VAE → artifact (hashed encoder: no downloads)
    timings["rqvae_s"] = round(run(
        "genrec_tpu.trainers.rqvae_trainer", "config/tiger/amazon/rqvae.gin",
        small + rqvae_over), 1)
    art = os.path.join(out, "rqvae", "artifact")
    sem = np.load(os.path.join(art, "sem_ids.npy"))
    assert sem.ndim == 2 and sem.shape[1] == expect_levels, sem.shape
    print(f"artifact OK: sem_ids {sem.shape}", flush=True)

    # 2. TIGER consumes the artifact (trie-constrained eval)
    timings["tiger_s"] = round(run(
        "genrec_tpu.trainers.tiger_trainer", "config/tiger/amazon/tiger.gin",
        small + [f"train.pretrained_rqvae_path = '{art}'"] + tiger_over), 1)

    # 3./4. SASRec (full-catalog eval) and HSTU (temporal bias)
    for m in ("sasrec", "hstu"):
        timings[f"{m}_s"] = round(run(
            f"genrec_tpu.trainers.{m}_trainer", f"config/{m}/amazon.gin",
            small + [o.format(m=m) for o in idseq_over]), 1)

    # 5. LCRec SFT + constrained decode over the same artifact
    timings["lcrec_s"] = round(run(
        "genrec_tpu.trainers.lcrec_trainer", "config/lcrec/amazon/lcrec.gin",
        small + [f"train.pretrained_rqvae_path = '{art}'"] + lcrec_over), 1)

    timings["total_s"] = round(sum(v for k, v in timings.items()
                                   if isinstance(v, float)), 1)
    path = os.path.join(work, "rehearsal_timings.json")
    with open(path, "w") as f:
        json.dump(timings, f, indent=2)
    print(f"\nDRESS REHEARSAL PASSED: ingest -> rqvae -> tiger -> sasrec "
          f"-> hstu -> lcrec all green on the raw-format fixture.\n"
          f"timings: {json.dumps(timings)}\nwritten: {path}", flush=True)


if __name__ == "__main__":
    main()
