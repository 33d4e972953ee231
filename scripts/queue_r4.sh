#!/bin/bash
# Round-4 TPU job queue: runs after the nh_192 hybrid rerun frees the
# chip. Each job appends to /tmp/queue_r4.log with exit markers so a
# fresh session can pick up state from the log alone.
set -u
cd /root/repo
L=/tmp/queue_r4.log

# wait for the hybrid rerun (sentinel: its final JSON metrics block),
# bounded at 45 min in case it died without printing
d=0
while ! grep -q 'global_rel_l2' /tmp/nh192_hybrid.log 2>/dev/null; do
  sleep 30; d=$((d + 30)); [ $d -ge 2700 ] && break
done

echo "=== $(date +%H:%M:%S) tube demo (non-beam e2e, .msh path) ===" >> $L
timeout 1800 python scripts/scale_demo.py --tube 2 24 48 --parts 8 \
  --steps 100000 --modal 16 --cutoff 0.75 --out runs/tube_demo \
  >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) profile_exchanged 384^3/256 box (grid rows) ===" >> $L
timeout 1800 python scripts/profile_exchanged.py --pmethod box >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) scale_384_r4: full pipeline, box + grid exchange ===" >> $L
timeout 7200 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
  --steps 200000 --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --pmethod box --exchange grid --out runs/scale_384_r4 \
  >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) linear 192^3/64 hybrid (VERDICT #7) ===" >> $L
timeout 3600 python scripts/scale_demo.py --cells 192 12 12 --parts 64 \
  --steps 100000 --arch hybrid --modal 16 --order 16 --cutoff 0.75 \
  --pmethod box --exchange grid --out runs/lin_192_hybrid >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE DONE" >> $L
