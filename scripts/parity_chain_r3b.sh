#!/bin/bash
# Round-3 continuation chain (v2, post init-parity fix). After the
# in-flight TIGER parity seeds finish, priority order:
#   1. SASRec/HSTU genrec_tpu re-runs with the reference-matched weight
#      init (the r3b fix: xavier-uniform / trunc-normal-0.02 Dense kernels,
#      near-zero HSTU bias tables). Old tpu-side rows move to
#      *_pre_init_fix.jsonl first (the rqvae_runs_pre_sinkhorn_fix.jsonl
#      precedent) so the report never mixes init regimes.
#   2. k-means Lloyd-fixpoint collision probe (end-to-end evidence for the
#      committed init-iteration change).
#   3. More TIGER seeds (103-104), then fp32 isolation variants.
# Sequential on purpose — 4 host cores.
#
# Usage: scripts/parity_chain_r3b.sh <pid-of-running-tiger-parity>
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== tiger 3-seed chain done =="

echo "== [1] sasrec/hstu tpu-side re-runs, reference-matched init =="
$P - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
for model in ("sasrec", "hstu"):
    path = f"out/parity/{model}_runs.jsonl"
    rows = [json.loads(l) for l in open(path)]
    keep = [r for r in rows if r["side"] != "genrec_tpu"]
    old = [r for r in rows if r["side"] == "genrec_tpu"]
    with open(f"out/parity/{model}_runs_pre_init_fix.jsonl", "a") as f:
        for r in old:
            f.write(json.dumps(r) + "\n")
    with open(path, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    print(f"{model}: kept {len(keep)} reference rows, "
          f"archived {len(old)} pre-init-fix tpu rows")
EOF
$P scripts/reference_parity.py --model sasrec --side genrec_tpu --seeds 3 \
    >> out/parity/idseq_run.log 2>&1
echo "sasrec rc=$?"
$P scripts/reference_parity.py --model hstu --side genrec_tpu --seeds 3 \
    >> out/parity/idseq_run.log 2>&1
echo "hstu rc=$?"
$P scripts/reference_parity.py --report

echo "== [2] kmeans collision probe =="
$P scripts/kmeans_collision_probe.py 100 104 105 \
    >> out/parity/kmeans_probe.log 2>&1
echo "probe rc=$?"

echo "== [3] tiger seeds 103-104 =="
$P scripts/reference_parity.py --model tiger --seeds 2 --seed-base 103 \
    >> out/parity/tiger_run.log 2>&1
echo "rc=$?"

echo "== [4] fp32 isolation (sasrec, then hstu) =="
$P scripts/reference_parity.py --model sasrec --side genrec_tpu --fp32 \
    --seeds 3 >> out/parity/idseq_run.log 2>&1
$P scripts/reference_parity.py --model hstu --side genrec_tpu --fp32 \
    --seeds 3 >> out/parity/idseq_run.log 2>&1
$P scripts/reference_parity.py --report
echo "== chain done =="
