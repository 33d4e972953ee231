#!/bin/bash
# Round-3 plateau-attack experiment queue (96x8x8 / 16 parts / 100k steps).
# Sequential: ONE TPU client at a time (axon relay wedges otherwise).
set -u
cd /root/repo
D="runs/scale_96"
run() {
  echo "=== $(date +%H:%M:%S) rerun $* ===" >> /tmp/queue_r3b.log
  timeout 3000 python scripts/rerun_online.py --dir "$D" \
    --cells 96 8 8 --parts 16 --steps 100000 "$@" \
    >> /tmp/queue_r3b.log 2>&1
  echo "=== exit $? ===" >> /tmp/queue_r3b.log
}

run --modal 16 --no-consensus                      # combine the two r3 winners
run --modal 16 --no-consensus --ensemble 4         # seed-ensemble
run --modal 16 --no-consensus --phases 4           # 4x training windows
run --modal 32 --no-consensus                      # modal capacity
run --modal 16 --no-consensus --seed 1             # retrain spread datum
run --modal 16 --no-consensus --cutoff 1.0         # DIAGNOSTIC upper bound
echo "QUEUE DONE" >> /tmp/queue_r3b.log
