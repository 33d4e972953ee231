#!/bin/bash
# Round-4 queue C: runs after queue_r4b.sh drains.
# 1. VERDICT #5 completion: full exchanged step with fint stencil +
#    grid exchange at 384^3/256 (the gather/scatter-free step).
# 2. VERDICT #3: stage-4-only rerun of the 384^3/256 pipeline on the
#    queue-A artifacts with banded-RCM (Pallas online kernel path) and
#    the wall-breakdown instrumentation; targets <=820 s (r3: 1446 s).
# 3. bench.py refresh (round-end BENCH_DETAILS).
set -u
cd /root/repo
L=/tmp/queue_r4c.log

d=0
while ! grep -q 'QUEUE B DONE' /tmp/queue_r4b.log 2>/dev/null; do
  sleep 30; d=$((d + 30)); [ $d -ge 7200 ] && break
done

echo "=== $(date +%H:%M:%S) profile_exchanged 384^3/256 box, fint=stencil ===" >> $L
timeout 2400 python scripts/profile_exchanged.py --pmethod box \
  --mode stencil >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) scale_384_r4 stage-4 rerun: banded + Pallas online kernel ===" >> $L
timeout 4200 python scripts/rerun_online.py --dir runs/scale_384_r4 \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --arch expfit --order 16 --modal 8 --no-consensus --cutoff 0.75 \
  --skip-retrain >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) bench.py ===" >> $L
timeout 580 python bench.py >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE C DONE" >> $L
