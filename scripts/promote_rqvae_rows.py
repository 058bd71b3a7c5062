"""Promote post-MLP-init-fix RQ-VAE rows to the official parity table.

The r4 MLP init-parity fix (TORCH_LINEAR_INIT in nn/mlp.py) changed the
RQ-VAE's training dynamics; the A/B probe (rqvae_ab_r4.jsonl, arm
``mlpfix``) re-ran the full parity recipe at 3 seeds. This script archives
the stale pre-fix genrec_tpu rows to rqvae_runs_pre_mlp_init_fix.jsonl and
writes the mlpfix-arm rows (git-SHA-tagged) as the official genrec_tpu
side, so the report never mixes init regimes (same convention as the
*_pre_init_fix.jsonl and *_pre_sinkhorn_fix.jsonl archives).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "out", "parity")

ab = [json.loads(l) for l in open(os.path.join(OUT, "rqvae_ab_r4.jsonl"))]
promoted = []
for r in ab:
    if r.get("arm") == "mlpfix":
        row = {k: v for k, v in r.items() if k not in ("arm", "kmeans_init")}
        promoted.append(row)
if len(promoted) < 3:
    sys.exit(f"only {len(promoted)} mlpfix rows - wait for the A/B queue")

path = os.path.join(OUT, "rqvae_runs.jsonl")
rows = [json.loads(l) for l in open(path)]
keep = [r for r in rows if r["side"] != "genrec_tpu"]
old = [r for r in rows if r["side"] == "genrec_tpu"]
with open(os.path.join(OUT, "rqvae_runs_pre_mlp_init_fix.jsonl"), "a") as f:
    for r in old:
        f.write(json.dumps(r) + "\n")
with open(path, "w") as f:
    for r in keep + promoted:
        f.write(json.dumps(r) + "\n")
print(f"archived {len(old)} pre-fix rows, promoted {len(promoted)} "
      f"mlpfix rows ({[r['seed'] for r in promoted]})")
