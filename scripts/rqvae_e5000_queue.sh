#!/bin/bash
# RQ-VAE at the FULL reference recipe (5000 epochs — the parity tables so
# far used 2000; the collision-rate trajectories are still falling at
# 2000, so the remaining 2-3x gap may simply be an epoch-budget artifact).
# Both sides, 3 seeds, rows to rqvae_runs_e5000.jsonl; artifacts get an
# _e5000 suffix so the shared TIGER sem-id artifact (rqvae_tpu_100) is
# never overwritten. Waits for the pid in $1 (the 2000-epoch A/B queue).
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu nice -n 10 python - <<'EOF' \
    >> out/parity/rqvae_e5000.log 2>&1
import json
import sys
sys.path.insert(0, "/root/repo")
from scripts.reference_parity import OUT_DIR, git_sha, make_shared_corpus
from scripts.parity_rqvae_tiger import run_reference_rqvae, run_tpu_rqvae
import os

catalog, _ = make_shared_corpus()
path = os.path.join(OUT_DIR, "rqvae_runs_e5000.jsonl")
done = set()
if os.path.exists(path):
    done = {(r["side"], r["seed"]) for r in map(json.loads, open(path))}
for seed in (100, 104, 105):
    for side, fn in (("genrec_tpu",
                      lambda s: run_tpu_rqvae(s, 5000, out_suffix="_e5000")),
                     ("reference",
                      lambda s: run_reference_rqvae(catalog, s, 5000))):
        if (side, seed) in done:
            continue
        rec = fn(seed)
        rec["git_sha"] = git_sha()
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
EOF
echo "rqvae e5000 queue done"
