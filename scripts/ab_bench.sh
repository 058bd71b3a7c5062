#!/bin/bash
# 3-way A/B of the fused kernels on the real TIGER train step.
# Usage: bash scripts/ab_bench.sh  (run from repo root, TPU env)
set -u
cd "$(dirname "$0")/.."
echo "=== A: pure XLA (all fused kernels off) ==="
GENREC_TPU_NO_FUSED_KERNELS=1 timeout 2400 python bench.py 2>&1 | grep -vE "WARNING|^I[0-9]"
echo "=== B: fused dropout only (attention kernel off) ==="
GENREC_TPU_NO_FUSED_ATTENTION=1 timeout 2400 python bench.py 2>&1 | grep -vE "WARNING|^I[0-9]"
echo "=== C: all fused kernels on ==="
timeout 2400 python bench.py 2>&1 | grep -vE "WARNING|^I[0-9]"
