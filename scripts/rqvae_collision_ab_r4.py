"""RQ-VAE collision-rate A/B (VERDICT r3 #5): isolate the two remaining
divergences from the reference recipe after the r3 log-domain Sinkhorn fix:

  (a) encoder/decoder MLP weight init — now matched to torch's nn.Linear
      default (TORCH_LINEAR_INIT, this round) vs the old flax lecun_normal;
  (b) k-means seeding — our k-means++ vs the reference's uniform
      sample-without-replacement (``/root/reference/genrec/modules/
      kmeans.py:51-56``), via ``kmeans_init_mode="random"``.

Each arm trains the full parity recipe (2000 epochs, STE + Sinkhorn-last)
on the shared synthetic catalog and appends a tagged row to
out/parity/rqvae_ab_r4.jsonl.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       python scripts/rqvae_collision_ab_r4.py <seed> <arm>
where <arm> is ``mlpfix`` (k-means++) or ``mlpfix_randinit``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.reference_parity import OUT_DIR, bind_tpu_corpus, git_sha
from scripts.parity_rqvae_tiger import RQVAE_EPOCHS, _item_split, \
    make_shared_corpus


def run(seed: int, arm: str) -> dict:
    import jax.numpy as jnp

    from genrec_tpu.models.rqvae import RqVae
    from genrec_tpu.core.checkpoint import load_rqvae_artifact
    from genrec_tpu.trainers.rqvae_trainer import train

    bind_tpu_corpus()
    init_mode = "random" if arm.endswith("randinit") else "kmeans++"
    out_dir = os.path.join(OUT_DIR, f"rqvae_ab_{arm}_{seed}")
    t0 = time.time()
    res = train(epochs=RQVAE_EPOCHS, dataset_type="synthetic",
                eval_every=RQVAE_EPOCHS // 4, save_model_every=10 ** 9,
                save_dir_root=out_dir, wandb_logging=False, seed=seed,
                kmeans_init_mode=init_mode)
    params, cfg, _ = load_rqvae_artifact(res["artifact_dir"])
    model = RqVae(input_dim=cfg["input_dim"], embed_dim=cfg["embed_dim"],
                  hidden_dims=tuple(cfg["hidden_dims"]),
                  codebook_size=cfg["codebook_size"],
                  n_layers=cfg["n_layers"])
    _, eval_emb = _item_split(
        np.asarray(make_shared_corpus()[0].embeddings, np.float32))
    out = model.apply({"params": params}, jnp.asarray(eval_emb),
                      gumbel_t=0.2, train=False)
    return {"side": "genrec_tpu", "model": "rqvae", "arm": arm, "seed": seed,
            "epochs": RQVAE_EPOCHS, "kmeans_init": init_mode,
            "eval_loss": float(out.loss),
            "eval_recon_loss": float(out.reconstruction_loss),
            "collision_rate_all": float(res["collision_rate"]),
            "train_seconds": round(time.time() - t0, 1),
            "git_sha": git_sha()}


if __name__ == "__main__":
    seed, arm = int(sys.argv[1]), sys.argv[2]
    rec = run(seed, arm)
    with open(os.path.join(OUT_DIR, "rqvae_ab_r4.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
