#!/bin/bash
# Round-5 queue C: TPU measurement queue, auto-chained after queue B
# (the nh_384 flagship) releases the device. One TPU client at a time —
# every item runs strictly sequentially. Ordered so the must-have
# artifacts land first; the long LSTM ablations run last.
#
#   a. unstructured NH bench (VERDICT #2): incident vs windowed-MXU on
#      the irregular Delaunay beam at the 96x8x8 class / 16 parts
#   b. stage-4 rerun on the flagship artifacts with the on-device
#      expfit pack (VERDICT #3/#4): wall + breakdown into the artifact
#   c. re-land the linear 384^3/256 expfit stencil pipeline so every
#      headline perf number is a committed artifact field (VERDICT #3)
#   h. irregular unstructured end-to-end pipeline at 64 parts
#   g. full-scale comm account (8/16/64/256 parts) on TPU (VERDICT #5)
#   f. bench.py refresh (driver artifact + /verify TPU leg)
#   d. pure-LSTM drift ablations at 192x12x12/64 (VERDICT #6)
#   e. pure-LSTM drift ablations on the tube 2x24x48/8 (VERDICT #6)
set -u
echo $$ > /tmp/queue_r5c.pid
trap 'kill -- -$$ 2>/dev/null' EXIT
cd /root/repo
L=/tmp/queue_r5c.log
# wait for queue B's WHOLE process group (the 08:21 incident: the
# wrapper died but timeout+python lived on, and a stale pid check let
# two TPU clients run concurrently — wedging the axon relay)
while :; do
  bp="$(cat /tmp/queue_r5b.pid 2>/dev/null)" || true
  [ -z "$bp" ] && break
  kill -0 -- "-$bp" 2>/dev/null || kill -0 "$bp" 2>/dev/null || break
  sleep 60
done
echo "=== $(date +%H:%M:%S) queue C start (pid $$) ===" >> $L

echo "=== $(date +%H:%M:%S) a: bench_unstructured ===" >> $L
timeout 3600 python scripts/bench_unstructured.py --cells 96 8 8 \
  --parts 16 --out BENCH_UNSTRUCTURED.json >> $L 2>&1
echo "=== a exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) b: nh_384 stage-4 rerun (on-device pack) ===" >> $L
timeout 5000 python scripts/rerun_online.py --dir runs/nh_384 \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --material neo_hookean --fint stencil --arch hybrid --order 16 \
  --modal 16 --no-consensus --cutoff 0.75 --skip-retrain >> $L 2>&1
echo "=== b exit $? ===" >> $L

if [ ! -f runs/scale_384_r5/summary.json ]; then
  echo "=== $(date +%H:%M:%S) c: linear 384^3 expfit re-land ===" >> $L
  timeout 8000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
    --steps 200000 --arch expfit --order 16 --modal 8 --no-consensus \
    --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
    --out runs/scale_384_r5 >> $L 2>&1
  echo "=== c exit $? ===" >> $L
else
  echo "=== c already landed (summary.json exists); skipping ===" >> $L
fi

echo "=== $(date +%H:%M:%S) h: irregular unstructured e2e at 64 parts ===" >> $L
timeout 6000 python scripts/scale_demo.py --irregular 160 10 10 --parts 64 \
  --steps 100000 --arch hybrid --order 16 --modal 16 --no-consensus \
  --cutoff 0.75 --pmethod graph --fint auto --exchange psum \
  --out runs/irregular_160 >> $L 2>&1
echo "=== h exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) g: comm account on TPU (8/16/64/256 parts) ===" >> $L
timeout 6000 python scripts/comm_account.py --steps 2000 >> $L 2>&1
echo "=== g exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) f: bench.py ===" >> $L
timeout 900 python bench.py >> $L 2>&1
echo "=== f exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) d: lstm ablation 192x12x12/64 ===" >> $L
timeout 12000 python scripts/lstm_ablation.py --dir runs/lin_192_ablation \
  --cells 192 12 12 --parts 64 --steps 100000 >> $L 2>&1
echo "=== d exit $? ===" >> $L

echo "=== $(date +%H:%M:%S) e: lstm ablation tube 2x24x48/8 ===" >> $L
timeout 8000 python scripts/lstm_ablation.py --dir runs/tube_ablation \
  --tube 2 24 48 --parts 8 --steps 100000 --pmethod graph --fint auto \
  --exchange psum >> $L 2>&1
echo "=== e exit $? ===" >> $L
echo "QUEUE C DONE" >> $L
rm -f /tmp/queue_r5c.pid
