#!/bin/bash
# COBRA throughput investigation (VERDICT r2 item 5): where do the 71.6 ms
# go at B=64?  Sequential single-TPU-process protocol (CLAUDE.md).
set -u
cd /root/repo
run() {
  echo "== $* =="
  timeout 1800 "$@" 2>&1
  echo "rc=$?"
}
run python bench.py --model cobra --steps 30 --repeats 3
run env GENREC_TPU_NO_FUSED_ATTENTION=1 \
    python bench.py --model cobra --steps 30 --repeats 3
run env GENREC_TPU_NO_FUSED_KERNELS=1 \
    python bench.py --model cobra --steps 30 --repeats 3
run python bench.py --model cobra --steps 30 --repeats 3 --batch 128
run python bench.py --model cobra --steps 30 --repeats 3 --batch 256
echo "== cobra ab done =="
