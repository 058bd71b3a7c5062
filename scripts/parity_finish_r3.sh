#!/bin/bash
# Round-3 parity finish: the evidence still missing after the resume chain
# was interrupted — the HSTU genrec_tpu seed-100 rerun and every TIGER run.
# Sequential on purpose (4 host cores; see parity_resume_r3.sh).
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

echo "== [1/3] hstu genrec_tpu seed 100 rerun =="
$P scripts/reference_parity.py --model hstu --side genrec_tpu \
    --seeds 1 --seed-base 100 >> out/parity/idseq_run.log 2>&1
echo "rc=$?"

echo "== [2/3] tiger both sides x3 seeds =="
$P scripts/reference_parity.py --model tiger --seeds 3 \
    >> out/parity/tiger_run.log 2>&1
echo "rc=$?"

echo "== [3/3] tiger both sides x2 more seeds (median-of-5) =="
$P scripts/reference_parity.py --model tiger --seeds 2 --seed-base 103 \
    >> out/parity/tiger_run.log 2>&1
echo "rc=$?"

echo "== parity finish done =="
$P scripts/reference_parity.py --report
