#!/bin/bash
# Confirm the newly-adopted fuse defaults end-to-end on the real chip
# (compiles cached from the r3 probe), then probe one step further
# (hstu x32, sasrec x64) for any remaining dispatch headroom.
# Sequential — never two TPU processes at once. Host is running CPU
# parity jobs, which fused dispatch is largely insensitive to; treat
# any *regression* here as contamination, any gain as real.
set -u
cd /root/repo

for m in sasrec hstu tiger rqvae; do
  echo "== $m (new default fuse) =="
  timeout 2400 python bench.py --model "$m"
done

echo "== hstu fused-32 probe =="
GENREC_TPU_IDSEQ_FUSE_STEPS=32 timeout 2400 python bench.py --model hstu
echo "== sasrec fused-64 probe =="
GENREC_TPU_IDSEQ_FUSE_STEPS=64 timeout 2400 python bench.py --model sasrec
echo "== confirm done =="
