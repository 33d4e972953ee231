#!/bin/bash
# Round-3 queue F: 192^3/64 post-fix refinements. The first expfit run
# (global 4.46%) was pencil-data-starved: at 192 the dt halves, so the
# cut_off=0.5 training window ends ~0.1 s after the 1 s ramp (~87
# autonomous rows for a 24-mode fit, held-out 3e-2 vs 1e-4 at 96^3).
# Stage 1 is reused; each rerun refits stage 3 only.
set -u
cd /root/repo
while ! grep -q 'QUEUE DONE' /tmp/queue_r3e.log 2>/dev/null; do sleep 30; done

D="runs/scale_192_fix"
run192() {
  echo "=== $(date +%H:%M:%S) rerun192 $* ===" >> /tmp/queue_r3f.log
  timeout 4000 python scripts/rerun_online.py --dir "$D" \
    --cells 192 12 12 --parts 64 --steps 100000 "$@" \
    >> /tmp/queue_r3f.log 2>&1
  echo "=== exit $? ===" >> /tmp/queue_r3f.log
}

run192 --arch expfit --modal 8 --no-consensus --order 10
run192 --arch expfit --modal 8 --no-consensus --order 16 --cutoff 0.75
run192 --modal 16                              # post-fix LSTM at 192^3
echo "QUEUE DONE" >> /tmp/queue_r3f.log
