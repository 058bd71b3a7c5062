"""Amazon dress rehearsal: the full real-data pipeline on a mini fixture.

One command proves the repo is one `scp` away from a real Amazon-2014 run
(VERDICT round-1 task #5): it writes a raw-format mini dataset
(reviews_*.json.gz + meta_*.json.gz, the exact layout the reference's
download step produces — ``/root/reference/README.md:120-127``), then
drives the *drop-in configs* end to end:

    ingest → RQ-VAE (artifact) → TIGER (trie eval) → SASRec → HSTU → LCRec

with only size/epoch gin overrides — the same command lines a user would
run on the real data, minus the downloads.

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/amazon_rehearsal.py [workdir]

Exits non-zero if any stage fails or the artifact contract breaks.
"""
from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_fixture(root: str, n_items: int = 60, n_users: int = 40) -> None:
    raw = os.path.join(root, "raw", "beauty")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(0)
    with gzip.open(os.path.join(raw, "reviews_Beauty_5.json.gz"), "wt") as f:
        for u in range(n_users):
            n = int(rng.integers(6, 12))
            items = rng.choice(n_items, size=n, replace=False)
            t0 = 1_300_000_000 + u
            for i, item in enumerate(items):
                f.write(json.dumps({
                    "asin": f"A{item:03d}", "reviewerID": f"U{u}",
                    "unixReviewTime": t0 + i * 1000, "overall": 5.0}) + "\n")
    with gzip.open(os.path.join(raw, "meta_Beauty.json.gz"), "wt") as f:
        for i in range(n_items):
            f.write(json.dumps({
                "asin": f"A{i:03d}", "title": f"Beauty product {i}",
                "price": 9.99, "brand": f"Brand{i % 7}",
                "categories": [["Beauty", f"Cat{i % 5}"]]}) + "\n")


def run(module: str, cfg: str, overrides: list[str]) -> None:
    cmd = [sys.executable, "-m", module, cfg]
    for o in overrides:
        cmd += ["--gin", o]
    print(f"\n=== {module} ===\n$ {' '.join(cmd)}", flush=True)
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        print(f"STAGE FAILED: {module}", flush=True)
        sys.exit(1)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="amazon_rehearsal_")
    data = os.path.join(work, "dataset")
    out = os.path.join(work, "out")
    write_fixture(data)
    print(f"fixture: {data}\noutputs: {out}", flush=True)

    small = [
        f"train.dataset_folder = '{data}'",
        "train.split = 'beauty'",
    ]
    # 1. RQ-VAE → artifact (tiny model, hashed encoder: no downloads)
    run("genrec_tpu.trainers.rqvae_trainer", "config/tiger/amazon/rqvae.gin",
        small + [
            "train.encoder_model_name = 'hashed'",
            "train.epochs = 30", "train.warmup_epochs = 4",
            "train.batch_size = 32",
            "train.vae_embed_dim = 16", "train.vae_hidden_dims = (64, 32)",
            "train.vae_codebook_size = 8",
            "train.eval_every = 30", "train.kmeans_init_batch = 64",
            f"train.save_dir_root = '{out}/rqvae'",
        ])
    art = os.path.join(out, "rqvae", "artifact")
    sem = np.load(os.path.join(art, "sem_ids.npy"))
    assert sem.ndim == 2 and sem.shape[1] == 3, sem.shape
    print(f"artifact OK: sem_ids {sem.shape}", flush=True)

    # 2. TIGER consumes the artifact (trie-constrained eval)
    run("genrec_tpu.trainers.tiger_trainer", "config/tiger/amazon/tiger.gin",
        small + [
            f"train.pretrained_rqvae_path = '{art}'",
            "train.epochs = 2", "train.batch_size = 16",
            "train.embedding_dim = 16", "train.attn_dim = 32",
            "train.num_heads = 2", "train.n_layers = 1",
            "train.num_item_embeddings = 8", "train.num_beams = 4",
            "train.eval_valid_every_epoch = 2",
            "train.eval_test_every_epoch = 2",
            f"train.save_dir_root = '{out}/tiger'",
        ])

    # 3. SASRec (raw item ids, full-catalog eval)
    run("genrec_tpu.trainers.sasrec_trainer", "config/sasrec/amazon.gin",
        small + [
            "train.num_epochs = 2", "train.batch_size = 16",
            "train.hidden_units = 16", "train.num_blocks = 1",
            "train.num_heads = 1", "train.eval_every_epoch = 2",
            f"train.save_dir_root = '{out}/sasrec'",
        ])

    # 4. HSTU (timestamps + temporal bias)
    run("genrec_tpu.trainers.hstu_trainer", "config/hstu/amazon.gin",
        small + [
            "train.num_epochs = 2", "train.batch_size = 16",
            "train.hidden_units = 16", "train.num_blocks = 1",
            "train.num_heads = 1", "train.eval_every_epoch = 2",
            f"train.save_dir_root = '{out}/hstu'",
        ])

    # 5. LCRec SFT + constrained decode over the same artifact
    run("genrec_tpu.trainers.lcrec_trainer",
        "config/lcrec/amazon/lcrec.gin",
        small + [
            f"train.pretrained_rqvae_path = '{art}'",
            "train.num_codebooks = 3", "train.codebook_size = 8",
            "train.epochs = 1", "train.batch_size = 8",
            "train.max_len = 96", "train.d_model = 32",
            "train.n_layers = 1", "train.n_heads = 4",
            "train.n_kv_heads = 2", "train.ff_dim = 64",
            "train.base_vocab = 2000", "train.num_beams = 4",
            "train.max_train_samples = 64", "train.max_eval_samples = 16",
            "train.use_lora = False",
            f"train.save_dir_root = '{out}/lcrec'",
        ])

    print("\nDRESS REHEARSAL PASSED: ingest -> rqvae -> tiger -> sasrec "
          "-> hstu -> lcrec all green on the raw-format fixture.",
          flush=True)


if __name__ == "__main__":
    main()
