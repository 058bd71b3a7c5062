"""Probe: does Lloyd-to-convergence k-means init close the collision gap?

Round-3 parity left RQ-VAE collisions at 5-11 items/2000 vs the reference's
1-3 (out/parity/rqvae_runs.jsonl). The one remaining init-statistics
difference is iteration count: the reference (modules/kmeans.py:89-95) runs
Lloyd to its assignment fixpoint; ours capped at 100. Re-run the worst
parity seeds with max_iters=1000 (early-stopped) and compare.

Appends to out/parity/rqvae_kmeans_probe.jsonl (NOT the official table).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.parity_rqvae_tiger import RQVAE_EPOCHS, run_tpu_rqvae

OUT = os.path.join(REPO, "out", "parity", "rqvae_kmeans_probe.jsonl")


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [100, 104, 105]
    for seed in seeds:
        rec = run_tpu_rqvae(seed, RQVAE_EPOCHS, out_suffix="_km1000")
        rec["note"] = "kmeans max_iters=1000 (Lloyd to fixpoint)"
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
