#!/bin/bash
# Round-3 parity resume: the pieces still missing after the first r3 session.
# Sequential on purpose — 4 host cores; concurrent runs contaminate each
# other (the stale hstu seed-100 row in out/parity/hstu_stale_runs.rej is
# what concurrency did last time).
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

echo "== [1/3] hstu genrec_tpu seed 100 rerun =="
$P scripts/reference_parity.py --model hstu --side genrec_tpu \
    --seeds 1 --seed-base 100 >> out/parity/idseq_run.log 2>&1
echo "rc=$?"

echo "== [2/3] rqvae both sides x3 seeds =="
$P scripts/reference_parity.py --model rqvae --seeds 3 \
    >> out/parity/rqvae_tiger_run.log 2>&1
echo "rc=$?"

echo "== [3/3] tiger both sides x3 seeds =="
$P scripts/reference_parity.py --model tiger --seeds 3 \
    >> out/parity/rqvae_tiger_run.log 2>&1
echo "rc=$?"

echo "== parity resume done =="
$P scripts/reference_parity.py --report
