#!/bin/bash
# Round-3 queue C: expfit online deployment (plateau attack, VERDICT #1)
# + coarse-mesh consensus A/B (VERDICT #8). Waits for queue_r3b to drain
# first — ONE TPU client at a time (axon relay wedges otherwise).
set -u
cd /root/repo
while ! grep -q 'QUEUE DONE' /tmp/queue_r3b.log 2>/dev/null; do sleep 30; done

D="runs/scale_96"
run96() {
  echo "=== $(date +%H:%M:%S) rerun96 $* ===" >> /tmp/queue_r3c.log
  timeout 3000 python scripts/rerun_online.py --dir "$D" \
    --cells 96 8 8 --parts 16 --steps 100000 "$@" \
    >> /tmp/queue_r3c.log 2>&1
  echo "=== exit $? ===" >> /tmp/queue_r3c.log
}

# expfit: two-segment matrix-pencil system ID (offline recon 1e-5..3e-4).
# Raw (no-modal) expfit at 16 parts would materialize ~3 GB of physical
# predictions (the online_predictor guard rejects it); modal variants only.
run96 --arch expfit --modal 8 --no-consensus   # lab config
run96 --arch expfit --modal 16 --no-consensus  # modal capacity
run96 --arch expfit --modal 8                  # consensus interaction

# coarse consensus A/B (48x4x4 / 8 parts): regen pipeline, then A/B
C="runs/scale_48_r3"
echo "=== $(date +%H:%M:%S) scale_demo coarse regen ===" >> /tmp/queue_r3c.log
timeout 3000 python scripts/scale_demo.py --parts 8 --cells 48 4 4 \
  --steps 100000 --out "$C" >> /tmp/queue_r3c.log 2>&1
echo "=== exit $? ===" >> /tmp/queue_r3c.log
run48() {
  echo "=== $(date +%H:%M:%S) rerun48 $* ===" >> /tmp/queue_r3c.log
  timeout 3000 python scripts/rerun_online.py --dir "$C" \
    --cells 48 4 4 --parts 8 --steps 100000 "$@" \
    >> /tmp/queue_r3c.log 2>&1
  echo "=== exit $? ===" >> /tmp/queue_r3c.log
}
run48 --smooth 150                 # consensus ON (default)
run48 --smooth 150 --no-consensus  # consensus OFF
run48 --arch expfit --modal 8 --no-consensus  # expfit on coarse too
echo "QUEUE DONE" >> /tmp/queue_r3c.log
