#!/bin/bash
# Round-4 queue D: runs after queue_r4c.sh drains.
# 1. Stage-4 head-to-head at 384^3/256: the stencil face-plane online
#    path (scan at 6.1k steps/s floor) vs queue C's banded Pallas
#    kernel rerun, on the same artifacts/models.
# 2. The round's showcase: a fresh FULL 5-stage pipeline at 384^3/256
#    entirely on the gather/scatter-free path (stencil fint + grid
#    exchange, box partition) — stage 1 at the 3.24 ms/step full-step
#    rate, stage 4 on the face-plane online path.
set -u
cd /root/repo
L=/tmp/queue_r4d.log

d=0
while ! grep -q 'QUEUE C DONE' /tmp/queue_r4c.log 2>/dev/null; do
  sleep 30; d=$((d + 30)); [ $d -ge 10800 ] && break
done

echo "=== $(date +%H:%M:%S) scale_384_r4 stage-4 rerun: stencil face-plane path ===" >> $L
timeout 4200 python scripts/rerun_online.py --dir runs/scale_384_r4 \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --fint stencil --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --skip-retrain >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) scale_384_stencil: fresh full pipeline, stencil + grid ===" >> $L
timeout 6000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
  --steps 200000 --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
  --out runs/scale_384_stencil >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE D DONE" >> $L
