#!/bin/bash
# Round-4 queue D: restart after the attention-weight dropout parity fix (torch
# MHA drops attention weights during training; ours only dropped sublayer
# outputs). Reference cobra seed 100 already landed;
# genrec_tpu runs all 3 seeds with the new init, reference adds 101-102,
# then the LCRec head-to-head (backbone weights come from the converted
# reference checkpoint, so the encoder init change does not touch it).
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu OMP_NUM_THREADS=2 nice -n 5 python"

echo "== [1] cobra genrec_tpu seeds 100-102 (post init fix) =="
$P scripts/cobra_parity.py --side genrec_tpu --seeds 3 --epochs 6 \
    >> out/parity/cobra_run.log 2>&1
echo "rc=$?"

echo "== [2] cobra reference seeds 101-102 =="
$P scripts/cobra_parity.py --side reference --seeds 2 --seed-base 101 \
    --epochs 6 >> out/parity/cobra_run.log 2>&1
echo "rc=$?"

echo "== [3] lcrec head-to-head, 3 seeds/side =="
$P scripts/lcrec_parity.py --side both --seeds 3 --epochs 3 \
    >> out/parity/lcrec_run.log 2>&1
echo "rc=$?"

$P scripts/reference_parity.py --report
echo "== chain r4e done =="
