#!/bin/bash
# Round-5 queue B: resume the flagship nh_384 run from stage 3 (stages
# 1-2 completed in queue A; training crashed the remote worker before
# the closed-loop dispatch sizing fix).
set -u
cd /root/repo
L=/tmp/queue_r5b.log
echo "=== $(date +%H:%M:%S) nh_384 resume from stage 3 ===" >> $L
timeout 13000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
  --steps 200000 --material neo_hookean --arch hybrid --order 16 --modal 16 \
  --no-consensus --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
  --from-stage 3 --out runs/nh_384 >> $L 2>&1
echo "=== exit $? ===" >> $L
echo "QUEUE B DONE" >> $L
