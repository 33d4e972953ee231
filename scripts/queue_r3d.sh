#!/bin/bash
# Round-3 queue D: regenerate the fine-mesh pipeline AFTER the RCM
# channel-permutation fix (commit f40ae3e) and re-measure the "plateau".
# ONE TPU client at a time.
set -u
cd /root/repo
F="runs/scale_96_fix"

echo "=== $(date +%H:%M:%S) scale_demo 96 fix regen (expfit nc) ===" >> /tmp/queue_r3d.log
timeout 4000 python scripts/scale_demo.py --parts 16 --cells 96 8 8 \
  --steps 100000 --out "$F" --arch expfit --modal 8 --no-consensus \
  >> /tmp/queue_r3d.log 2>&1
echo "=== exit $? ===" >> /tmp/queue_r3d.log

run96() {
  echo "=== $(date +%H:%M:%S) rerun96fix $* ===" >> /tmp/queue_r3d.log
  timeout 3000 python scripts/rerun_online.py --dir "$F" \
    --cells 96 8 8 --parts 16 --steps 100000 "$@" \
    >> /tmp/queue_r3d.log 2>&1
  echo "=== exit $? ===" >> /tmp/queue_r3d.log
}

run96 --arch expfit --modal 8                  # consensus A/B post-fix
run96 --modal 16 --no-consensus                # LSTM post-fix
run96 --modal 16                               # LSTM + consensus post-fix
run96 --smooth 150                             # the r2 plateau config
echo "QUEUE DONE" >> /tmp/queue_r3d.log
