#!/bin/bash
# Round-4 TPU A/B queue (sequential; never two TPU processes). Waits for
# the pid in $1 (the bench-suite warm run), then:
#  1. GENREC_TPU_FAST_HASH=1 — 2-round dropout hash (dropout measured at
#     9% of the TIGER step; this halves the mask op chain).
#  2/3. --xla_tpu_scoped_vmem_limit_kib=32768/65536 — raising the scoped
#     VMEM budget can let XLA build larger fusion regions, attacking the
#     fragmentation ceiling documented in performance.md.
set -u
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

run() {
  echo "== $1 =="
  shift
  timeout 2400 "$@" 2>&1 | grep -E '"metric"' || echo "FAILED/empty"
}

run "fast-hash dropout" env GENREC_TPU_FAST_HASH=1 \
    python bench.py --model tiger --steps 30 --repeats 3
# scoped-vmem fusion experiment: NOT runnable here — this axon client's
# XLA rejects --xla_tpu_scoped_vmem_limit_kib (F-abort "Unknown flag"),
# so the fusion-budget lever stays untested. Measured outcome of the
# fast-hash arm: 19,845 ex/s vs 19,583 same-session baseline (+1.3%) —
# kept opt-in (GENREC_TPU_FAST_HASH=1).
echo "== tpu ab r4 done =="
