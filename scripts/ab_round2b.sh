#!/bin/bash
# Round-2b A/B: pure-XLA hash attention/dropout vs pallas vs plain,
# on the real TIGER paper-config train step. Run from repo root, TPU env.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $1 ==="
  shift
  env "$@" timeout 2400 python bench.py 2>&1 | grep -vE "WARNING|^I[0-9]"
}
run "A: all plain XLA (bernoulli dropout, autodiff softmax)" \
    GENREC_TPU_NO_FUSED_KERNELS=1
run "B: hash attention + plain dropout" GENREC_TPU_NO_HASH_DROPOUT=1
run "C: hash attention + hash dropout (candidate default)"
run "D: pallas attention + hash dropout" GENREC_TPU_ATTN_PALLAS=1
echo "=== done ==="
