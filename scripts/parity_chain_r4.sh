#!/bin/bash
# Round-4 parity chain (VERDICT r3 #1/#2): TIGER genrec_tpu re-runs with the
# torch-default Dense init fix (TORCH_LINEAR_INIT in nn/transformer.py +
# models/tiger.py), then grow every table to 5 seeds/side. Old tpu-side
# TIGER rows are archived to tiger_runs_pre_init_fix.jsonl first so the
# report never mixes init regimes (rows now carry git_sha too).
# Sequential on purpose - 4 host cores; everything CPU (JAX_PLATFORMS=cpu).
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

echo "== [0] archive pre-init-fix tiger tpu rows =="
$P - <<'EOF'
import json
path = "out/parity/tiger_runs.jsonl"
rows = [json.loads(l) for l in open(path)]
keep = [r for r in rows if r["side"] != "genrec_tpu"]
old = [r for r in rows if r["side"] == "genrec_tpu"]
with open("out/parity/tiger_runs_pre_init_fix.jsonl", "a") as f:
    for r in old:
        f.write(json.dumps(r) + "\n")
with open(path, "w") as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
print(f"tiger: kept {len(keep)} reference rows, archived {len(old)}")
EOF

echo "== [1] tiger tpu-side seeds 100-104, post init fix =="
$P scripts/reference_parity.py --model tiger --side genrec_tpu --seeds 5 \
    >> out/parity/tiger_run.log 2>&1
echo "tiger tpu rc=$?"

echo "== [2] tiger reference seed 104 (5th ref seed) =="
$P scripts/reference_parity.py --model tiger --side reference --seeds 1 \
    --seed-base 104 >> out/parity/tiger_run.log 2>&1
echo "tiger ref rc=$?"

echo "== [3] sasrec/hstu seeds 103-104 both sides =="
for m in sasrec hstu; do
  $P scripts/reference_parity.py --model $m --seeds 2 --seed-base 103 \
      >> out/parity/idseq_run.log 2>&1
  echo "$m rc=$?"
done

$P scripts/reference_parity.py --report
echo "== chain r4 done =="
