#!/bin/bash
# Round-3 queue E: post-fix scale-out. 192x12x12/64 full pipeline with
# the expfit surrogate (completes the resolution curve the r2 "plateau"
# blocked), plus the nonlinear (neo-Hookean) sync-avoiding demo where
# system identification does NOT apply and the LSTM must carry.
set -u
cd /root/repo
while ! grep -q 'QUEUE DONE' /tmp/queue_r3d.log 2>/dev/null; do sleep 30; done

echo "=== $(date +%H:%M:%S) scale_192_fix expfit ===" >> /tmp/queue_r3e.log
timeout 5400 python scripts/scale_demo.py --parts 64 --cells 192 12 12 \
  --steps 100000 --out runs/scale_192_fix --arch expfit --modal 8 \
  --no-consensus >> /tmp/queue_r3e.log 2>&1
echo "=== exit $? ===" >> /tmp/queue_r3e.log

echo "=== $(date +%H:%M:%S) nh_demo 48x4x4/8 LSTM ===" >> /tmp/queue_r3e.log
timeout 4000 python scripts/scale_demo.py --parts 8 --cells 48 4 4 \
  --steps 100000 --out runs/nh_demo --material neo_hookean \
  >> /tmp/queue_r3e.log 2>&1
echo "=== exit $? ===" >> /tmp/queue_r3e.log

echo "QUEUE DONE" >> /tmp/queue_r3e.log
