#!/bin/bash
# Round-3 follow-up probe: is there more dispatch overhead to reclaim past
# fused-8? Runs bench.py at higher scan-fuse factors (and a TIGER B=512
# point for MXU utilization) sequentially on the real chip. Each prints one
# JSON line; full records append to out/tpu_measurements.jsonl.
#
# Run only with an otherwise-quiet host (pause CPU jobs first): the fused
# dispatch measurement is exactly the host-overhead-sensitive one.
set -u
cd /root/repo

echo "== sasrec fused-16 =="
GENREC_TPU_IDSEQ_FUSE_STEPS=16 timeout 2400 python bench.py --model sasrec
echo "== sasrec fused-32 =="
GENREC_TPU_IDSEQ_FUSE_STEPS=32 timeout 2400 python bench.py --model sasrec
echo "== hstu fused-16 =="
GENREC_TPU_IDSEQ_FUSE_STEPS=16 timeout 2400 python bench.py --model hstu
echo "== tiger fused-16 =="
GENREC_TPU_TIGER_FUSE_STEPS=16 timeout 2400 python bench.py --model tiger
echo "== tiger B=512 fused-8 =="
timeout 2400 python bench.py --model tiger --batch 512
echo "== rqvae fused-32 =="
GENREC_TPU_RQVAE_FUSE_STEPS=32 timeout 2400 python bench.py --model rqvae
echo "== probe done =="
