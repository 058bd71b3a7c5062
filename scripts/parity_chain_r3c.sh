#!/bin/bash
# r3 continuation chain, part 2: after parity_chain_r3b.sh finishes, run
# the bf16-handicap isolation — genrec_tpu SASRec/HSTU parity seeds with
# amp=False (fp32), tagged side=genrec_tpu_fp32. If fp32 closes the small
# consistent deficit vs the (fp32 torch) reference, bf16 is the cause and
# the deficit is the documented production-precision tradeoff; if not,
# keep hunting (init / dropout / optimizer statistics).
# Usage: scripts/parity_chain_r3c.sh <pid-of-parity_chain_r3b>
set -u
cd /root/repo
P="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== r3b chain done; fp32 isolation runs =="
$P scripts/reference_parity.py --model sasrec --side genrec_tpu --fp32 \
    --seeds 3 >> out/parity/idseq_run.log 2>&1
echo "sasrec fp32 rc=$?"
$P scripts/reference_parity.py --model hstu --side genrec_tpu --fp32 \
    --seeds 3 >> out/parity/idseq_run.log 2>&1
echo "hstu fp32 rc=$?"
$P scripts/reference_parity.py --report
echo "== r3c chain done =="
