#!/bin/bash
# Round-3 queue H: LSTM at 192^3 with the training window clearing the
# ramp (same fairness as the expfit cut_off=0.75 datum).
set -u
cd /root/repo
while ! grep -q 'QUEUE DONE' /tmp/queue_r3g.log 2>/dev/null; do sleep 30; done
echo "=== $(date +%H:%M:%S) rerun192 LSTM modal16 cutoff 0.75 ===" >> /tmp/queue_r3h.log
timeout 4000 python scripts/rerun_online.py --dir runs/scale_192_fix \
  --cells 192 12 12 --parts 64 --steps 100000 --modal 16 --cutoff 0.75 \
  >> /tmp/queue_r3h.log 2>&1
echo "=== exit $? ===" >> /tmp/queue_r3h.log
echo "QUEUE DONE" >> /tmp/queue_r3h.log
