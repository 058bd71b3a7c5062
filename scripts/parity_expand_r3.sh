#!/bin/bash
# Round-3 parity seed expansion: wait for the resume chain to finish, then
# grow RQ-VAE to 6 seeds/side and TIGER to 5 seeds/side (median-of-5+ —
# the 10-epoch TIGER runs have large per-seed variance on both sides).
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

while pgrep -f "reference_parity.py --model tiger" > /dev/null; do
  sleep 60
done
echo "== resume chain done; expanding seeds =="

echo "== rqvae seeds 103-105, tpu side (post-sinkhorn-fix artifacts) =="
$P - <<'EOF'
import sys; sys.path.insert(0, "/root/repo")
from scripts.parity_rqvae_tiger import run_tpu_rqvae, RQVAE_EPOCHS
from scripts.reference_parity import append_run
for s in (103, 104, 105):
    append_run("rqvae", run_tpu_rqvae(s, RQVAE_EPOCHS, out_suffix="_sk2"))
EOF
echo "rc=$?"

echo "== rqvae seeds 103-105, reference side =="
$P scripts/reference_parity.py --model rqvae --side reference \
    --seeds 3 --seed-base 103 >> out/parity/rqvae_tiger_run.log 2>&1
echo "rc=$?"

echo "== tiger seeds 103-104, both sides =="
$P scripts/reference_parity.py --model tiger --seeds 2 --seed-base 103 \
    >> out/parity/rqvae_tiger_run.log 2>&1
echo "rc=$?"

echo "== expansion done =="
$P scripts/reference_parity.py --report
