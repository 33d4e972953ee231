#!/bin/bash
# Round-4 queue B: runs after queue_r4.sh drains. Accuracy upgrades on
# the round's two secondary rows (tube geometry, nh_96 hybrid).
set -u
cd /root/repo
L=/tmp/queue_r4b.log

d=0
while ! grep -q 'QUEUE DONE' /tmp/queue_r4.log 2>/dev/null; do
  sleep 30; d=$((d + 30)); [ $d -ge 10800 ] && break
done

echo "=== $(date +%H:%M:%S) tube demo, hybrid surrogate ===" >> $L
timeout 1800 python scripts/scale_demo.py --tube 2 24 48 --parts 8 \
  --steps 100000 --arch hybrid --modal 16 --order 16 --cutoff 0.75 \
  --out runs/tube_hybrid >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) nh_96 hybrid rerun (stages 3-5 on nh_96 artifacts) ===" >> $L
timeout 1800 python scripts/rerun_online.py --dir runs/nh_96 \
  --cells 96 8 8 --parts 16 --steps 100000 --arch hybrid --modal 16 \
  --order 16 --cutoff 0.75 --material neo_hookean >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE B DONE" >> $L
