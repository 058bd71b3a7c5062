#!/bin/bash
# Round-3 continuation chain: after the in-flight TIGER parity seeds
# (reference_parity.py --model tiger --seeds 3, started 04:21) finish,
# run the k-means Lloyd-fixpoint collision probe (the committed init
# change has no end-to-end collision evidence yet), then keep growing
# TIGER seeds. Sequential on purpose — 4 host cores.
#
# Usage: scripts/parity_chain_r3b.sh <pid-of-running-tiger-parity>
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== tiger 3-seed chain done; starting collision probe =="

$P scripts/kmeans_collision_probe.py 100 104 105 \
    >> out/parity/kmeans_probe.log 2>&1
echo "probe rc=$?"

echo "== tiger seeds 103-104 (median-of-5) =="
$P scripts/reference_parity.py --model tiger --seeds 2 --seed-base 103 \
    >> out/parity/tiger_run.log 2>&1
echo "rc=$?"
echo "== chain done =="
