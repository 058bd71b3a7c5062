"""Promote the best-available RQ-VAE evidence to the official parity table.

Preference order:
1. ``rqvae_runs_e5000.jsonl`` complete (≥3 seeds/side): the FULL reference
   recipe (5000 epochs — config/tiger/amazon/rqvae.gin). The r4 trajectory
   analysis showed the collision rate still falling at the 2000-epoch
   parity shortcut, so the full-recipe table is the honest comparison;
   the old rows are archived to ``rqvae_runs_e2000.jsonl``.
2. Otherwise: promote the post-MLP-init-fix 2000-epoch A/B rows (arm
   ``mlpfix``) over the stale pre-fix genrec_tpu rows (archived to
   ``rqvae_runs_pre_mlp_init_fix.jsonl``).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "out", "parity")


def load(name):
    p = os.path.join(OUT, name)
    return [json.loads(l) for l in open(p)] if os.path.exists(p) else []


def write(name, rows):
    with open(os.path.join(OUT, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def append(name, rows):
    with open(os.path.join(OUT, name), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def main():
    e5000 = load("rqvae_runs_e5000.jsonl")
    sides = {s: [r for r in e5000 if r["side"] == s]
             for s in ("genrec_tpu", "reference")}
    if all(len(v) >= 3 for v in sides.values()):
        # Idempotent: after the first promotion rqvae_runs.jsonl already
        # holds the e5000 rows — only genuine 2000-epoch leftovers (and
        # only ones not already archived) move to the archive.
        old = [r for r in load("rqvae_runs.jsonl")
               if r.get("epochs") != 5000]
        archived = load("rqvae_runs_e2000.jsonl")
        new_old = [r for r in old if r not in archived]
        if new_old:
            append("rqvae_runs_e2000.jsonl", new_old)
        write("rqvae_runs.jsonl", e5000)
        print(f"official table = FULL 5000-epoch recipe "
              f"({len(e5000)} rows); {len(new_old)} 2000-epoch rows archived")
        return

    ab = load("rqvae_ab_r4.jsonl")
    promoted = [{k: v for k, v in r.items()
                 if k not in ("arm", "kmeans_init")}
                for r in ab if r.get("arm") == "mlpfix"]
    if len(promoted) < 3:
        sys.exit(f"neither e5000 ({ {k: len(v) for k, v in sides.items()} }) "
                 f"nor mlpfix ({len(promoted)}) complete - wait for queues")
    rows = load("rqvae_runs.jsonl")
    keep = [r for r in rows if r["side"] != "genrec_tpu"]
    old = [r for r in rows if r["side"] == "genrec_tpu"]
    append("rqvae_runs_pre_mlp_init_fix.jsonl", old)
    write("rqvae_runs.jsonl", keep + promoted)
    print(f"archived {len(old)} pre-fix rows, promoted {len(promoted)} "
          f"mlpfix rows")


if __name__ == "__main__":
    main()
