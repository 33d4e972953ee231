#!/bin/bash
# Round-3 queue G: nh demo retry (crashed on a wedged TPU worker after
# the 192 run's full-length timing dispatch; scale_demo timing now
# bounded + fenced).
set -u
cd /root/repo
while ! grep -q 'QUEUE DONE' /tmp/queue_r3f.log 2>/dev/null; do sleep 30; done
echo "=== $(date +%H:%M:%S) nh_demo retry ===" >> /tmp/queue_r3g.log
timeout 4000 python scripts/scale_demo.py --parts 8 --cells 48 4 4 \
  --steps 100000 --out runs/nh_demo --material neo_hookean \
  >> /tmp/queue_r3g.log 2>&1
echo "=== exit $? ===" >> /tmp/queue_r3g.log
echo "QUEUE DONE" >> /tmp/queue_r3g.log
