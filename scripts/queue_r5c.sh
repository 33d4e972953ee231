#!/bin/bash
# Round-5 queue C: TPU measurement queue, auto-chained after queue B
# (the nh_384 flagship) releases the device. One TPU client at a time —
# every item runs strictly sequentially, must-have artifacts first, and
# each item's small artifacts are committed the moment it finishes (the
# 2026-08-20 reboot destroyed everything uncommitted).
#
#   a. unstructured NH bench (VERDICT #2): incident vs windowed-MXU on
#      the irregular Delaunay beam at the 96x8x8 class / 16 parts
#   b. stage-4 rerun on the flagship artifacts with the on-device
#      expfit pack (VERDICT #3/#4): wall + breakdown into the artifact
#   g. full-scale comm account (8/16/64/256 parts) on TPU (VERDICT #5)
#   f. bench.py refresh (driver artifact + /verify TPU leg)
#   h. irregular unstructured end-to-end pipeline at 64 parts (VERDICT #2)
#   c. re-land the linear 384^3/256 expfit stencil pipeline (VERDICT #3)
#   e. pure-LSTM drift ablations on the tube 2x24x48/8 (VERDICT #6)
#   d. pure-LSTM drift ablations at 192x12x12/64 (VERDICT #6)
#
# A hard wall-clock DEADLINE releases the device before the driver's
# end-of-round bench run (a second concurrent client wedges the relay).
set -u
echo $$ > /tmp/queue_r5c.pid
trap 'kill -- -$$ 2>/dev/null' EXIT
cd /root/repo
mkdir -p queue_logs
L=queue_logs/queue_r5c.log
DEADLINE=${DEADLINE:-$(date -d '2026-08-21 02:50 UTC' +%s)}

left() { echo $(( DEADLINE - $(date +%s) )); }

# run_item CAP cmd... : run with timeout min(CAP, time-left); skip when
# fewer than 5 minutes remain.
run_item() {
  local cap=$1; shift
  local l; l=$(left)
  if [ "$l" -lt 300 ]; then echo "=== SKIP (deadline): $* ===" >> $L; return 124; fi
  local t=$cap; [ "$l" -lt "$cap" ] && t=$l
  timeout "$t" "$@" >> $L 2>&1
}

commit() { bash scripts/commit_artifacts.sh "$@" >> $L 2>&1; }

# wait for queue B's WHOLE process group (the 08:21 incident: the
# wrapper died but timeout+python lived on, and a stale pid check let
# two TPU clients run concurrently — wedging the axon relay)
while :; do
  bp="$(cat /tmp/queue_r5b.pid 2>/dev/null)" || true
  [ -z "$bp" ] && break
  kill -0 -- "-$bp" 2>/dev/null || kill -0 "$bp" 2>/dev/null || break
  sleep 60
done
echo "=== $(date +%H:%M:%S) queue C start (pid $$, $(left)s to deadline) ===" >> $L

echo "=== $(date +%H:%M:%S) a: bench_unstructured ===" >> $L
run_item 3600 python scripts/bench_unstructured.py --cells 96 8 8 \
  --parts 16 --out BENCH_UNSTRUCTURED.json
echo "=== a exit $? ===" >> $L
commit "Unstructured NH bench on TPU: incident vs windowed-MXU vs banded (queue C a)" \
  BENCH_UNSTRUCTURED.json queue_logs/queue_r5c.log

echo "=== $(date +%H:%M:%S) b: nh_384 stage-4 rerun (on-device pack) ===" >> $L
run_item 5000 python scripts/rerun_online.py --dir runs/nh_384 \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --material neo_hookean --fint stencil --arch hybrid --order 16 \
  --modal 16 --no-consensus --cutoff 0.75 --skip-retrain
echo "=== b exit $? ===" >> $L
commit "Flagship stage-4 rerun with on-device expfit pack: wall + breakdown (queue C b)" \
  runs/nh_384 queue_logs/queue_r5c.log

echo "=== $(date +%H:%M:%S) g: comm account on TPU (8/16/64/256 parts) ===" >> $L
run_item 6000 python scripts/comm_account.py --steps 2000
echo "=== g exit $? ===" >> $L
commit "Full-scale per-step communication account on TPU (queue C g)" \
  BENCH_COMM.json queue_logs/queue_r5c.log

echo "=== $(date +%H:%M:%S) f: bench.py ===" >> $L
run_item 1200 python bench.py
echo "=== f exit $? ===" >> $L
commit "bench.py refresh on TPU (queue C f)" \
  BENCH_DETAILS.json queue_logs/queue_r5c.log

echo "=== $(date +%H:%M:%S) h: irregular unstructured e2e at 64 parts ===" >> $L
run_item 6000 python scripts/scale_demo.py --irregular 160 10 10 --parts 64 \
  --steps 100000 --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --pmethod graph --fint auto --exchange psum \
  --out runs/irregular_160
echo "=== h exit $? ===" >> $L
commit "Irregular unstructured end-to-end pipeline at 64 parts (queue C h)" \
  runs/irregular_160 queue_logs/queue_r5c.log

if [ ! -f runs/scale_384_r5/summary.json ]; then
  echo "=== $(date +%H:%M:%S) c: linear 384^3 expfit re-land ===" >> $L
  run_item 8000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
    --steps 200000 --arch expfit --order 16 --modal 8 --no-consensus \
    --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
    --out runs/scale_384_r5
  echo "=== c exit $? ===" >> $L
  commit "Linear 384^3/256 expfit stencil pipeline re-land (queue C c)" \
    runs/scale_384_r5 queue_logs/queue_r5c.log
else
  echo "=== c already landed (summary.json exists); skipping ===" >> $L
fi

echo "=== $(date +%H:%M:%S) e: lstm ablation tube 2x24x48/8 ===" >> $L
run_item 8000 python scripts/lstm_ablation.py --dir runs/tube_ablation \
  --tube 2 24 48 --parts 8 --steps 100000 --pmethod graph --fint auto \
  --exchange psum
echo "=== e exit $? ===" >> $L
commit "Pure-LSTM drift ablations on the tube (queue C e)" \
  runs/tube_ablation queue_logs/queue_r5c.log

echo "=== $(date +%H:%M:%S) d: lstm ablation 192x12x12/64 ===" >> $L
run_item 12000 python scripts/lstm_ablation.py --dir runs/lin_192_ablation \
  --cells 192 12 12 --parts 64 --steps 100000 --epochs 2000
echo "=== d exit $? ===" >> $L
commit "Pure-LSTM drift ablations at 192x12x12/64 (queue C d)" \
  runs/lin_192_ablation queue_logs/queue_r5c.log

echo "QUEUE C DONE ($(left)s to deadline)" >> $L
commit "Queue C log final" queue_logs/queue_r5c.log
rm -f /tmp/queue_r5c.pid
