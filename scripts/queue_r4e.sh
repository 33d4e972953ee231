#!/bin/bash
# Round-4 queue E: validate the run_streamed compile-discipline fix and
# the artifact-layout adoption at production scale (384^3/256), on the
# runs/scale_384_stencil artifacts (box partition, box-lex layout).
# 1. stage-4 stencil rerun: warmup_s should drop ~400 -> ~<150 s
#    (one probe-sized program instead of 3-4 distinct compiles),
#    total <= ~700 s (VERDICT #3 target was <=820).
# 2. stage-4 banded rerun: with layout adoption the accuracy must match
#    the stencil path (~0.01%), not the permuted 1.61% measured before
#    the fix (docs/STATUS_r4.md #8).
set -u
cd /root/repo
L=/tmp/queue_r4e.log

echo "=== $(date +%H:%M:%S) scale_384_stencil stage-4 rerun: stencil (timing validation) ===" >> $L
timeout 4200 python scripts/rerun_online.py --dir runs/scale_384_stencil \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --fint stencil --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --skip-retrain >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) scale_384_stencil stage-4 rerun: banded (layout-adoption validation) ===" >> $L
timeout 4200 python scripts/rerun_online.py --dir runs/scale_384_stencil \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --fint banded --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --skip-retrain >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE E DONE" >> $L
