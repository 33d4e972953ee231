#!/bin/bash
# Round-5 queue B: resume the flagship nh_384 run from stage 3 (stages
# 1-2 completed in queue A). Launch with:
#   setsid nohup bash scripts/queue_r5b.sh &
# The script records its own pid; as a setsid group leader, `kill -- -PID`
# tears down timeout+python too (the 08:21 incident left an orphaned
# python holding a TPU client after the wrapper died — two concurrent
# clients wedge the axon relay).
set -u
echo $$ > /tmp/queue_r5b.pid
trap 'kill -- -$$ 2>/dev/null' EXIT
cd /root/repo
L=/tmp/queue_r5b.log
echo "=== $(date +%H:%M:%S) nh_384 resume from stage 3 (pid $$) ===" >> $L
timeout 13000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
  --steps 200000 --material neo_hookean --arch hybrid --order 16 --modal 16 \
  --no-consensus --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
  --from-stage 3 --out runs/nh_384 >> $L 2>&1
echo "=== exit $? ===" >> $L
echo "QUEUE B DONE" >> $L
rm -f /tmp/queue_r5b.pid
