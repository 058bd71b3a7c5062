#!/bin/bash
# Resume of rqvae_e5000_queue.sh: the reference side's torch.compile
# (reduce-overhead) thrashed for >1h on the loaded host without reaching
# epoch 500; TORCHDYNAMO_DISABLE=1 runs the reference model eager
# (numerics-equivalent; noted on the rows). Skips completed (side, seed)
# pairs via the jsonl.
set -u
cd /root/repo
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu TORCHDYNAMO_DISABLE=1 \
    OMP_NUM_THREADS=2 nice -n 10 python - <<'PYEOF' \
    >> out/parity/rqvae_e5000.log 2>&1
import json, os, sys
sys.path.insert(0, "/root/repo")
from scripts.reference_parity import OUT_DIR, git_sha, make_shared_corpus
from scripts.parity_rqvae_tiger import run_reference_rqvae, run_tpu_rqvae

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
            print(f"skip {side} {seed}", flush=True)
            continue
        rec = fn(seed)
        rec["git_sha"] = git_sha()
        if side == "reference":
            rec["dynamo_disabled"] = True
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
PYEOF
echo "rqvae e5000 resume done"
