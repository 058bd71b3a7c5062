#!/bin/bash
# Round-4 queue B: the two head-to-heads the reference has never had
# (VERDICT r3 #3/#4) — COBRA and LCRec — run concurrently with the main
# tiger/idseq chain (nice'd; quality results are contention-immune).
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu nice -n 5 python"

echo "== [0] archive cobra smoke rows =="
if [ -f out/parity/cobra_runs.jsonl ]; then
  $P - <<'EOF'
import json
path = "out/parity/cobra_runs.jsonl"
rows = [json.loads(l) for l in open(path)]
keep = [r for r in rows if r.get("epochs", 0) > 1]
smoke = [r for r in rows if r.get("epochs", 0) <= 1]
if smoke:
    with open("out/parity/cobra_runs_smoke.jsonl", "a") as f:
        for r in smoke:
            f.write(json.dumps(r) + "\n")
    with open(path, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
print(f"cobra: kept {len(keep)}, archived {len(smoke)} smoke rows")
EOF
fi

echo "== [1] cobra head-to-head, 3 seeds/side =="
OMP_NUM_THREADS=2 $P scripts/cobra_parity.py --side both --seeds 3 \
    --epochs 6 >> out/parity/cobra_run.log 2>&1
echo "cobra rc=$?"

echo "== [2] lcrec head-to-head, 3 seeds/side =="
OMP_NUM_THREADS=2 $P scripts/lcrec_parity.py --side both --seeds 3 \
    --epochs 3 >> out/parity/lcrec_run.log 2>&1
echo "lcrec rc=$?"

$P scripts/reference_parity.py --report
echo "== chain r4b done =="
