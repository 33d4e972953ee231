#!/bin/bash
# Round-5 queue E: final TPU window after queue D's g/f.
#   x. pure NH comm-free/exchanged contrast at 384^3/256 (flagship row
#      + stage-4 fault isolation; scripts/nh_contrast.py)
#   h. small irregular unstructured e2e at 64 parts (expfit)
# Launched manually once queue D's item f commits. Deadline-gated.
set -u
echo $$ > /tmp/queue_r5e.pid
trap 'kill -- -$$ 2>/dev/null' EXIT
cd /root/repo
mkdir -p queue_logs
L=queue_logs/queue_r5e.log
DEADLINE=${DEADLINE:-$(date -d '2026-08-21 02:50 UTC' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
run_item() {
  local cap=$1; shift
  local l; l=$(left)
  if [ "$l" -lt 240 ]; then echo "=== SKIP (deadline): $* ===" >> $L; return 124; fi
  local t=$cap; [ "$l" -lt "$cap" ] && t=$l
  timeout "$t" "$@" >> $L 2>&1
}
commit() { bash scripts/commit_artifacts.sh "$@" >> $L 2>&1; }

echo "=== $(date +%H:%M:%S) queue E start (pid $$, $(left)s left) ===" >> $L

echo "=== $(date +%H:%M:%S) x: NH pure contrast 384^3/256 ===" >> $L
run_item 1500 python scripts/nh_contrast.py
echo "=== x exit $? ===" >> $L
commit "Pure NH comm-free/exchanged contrast at 384^3/256 (queue E x)" \
  runs/nh_384 queue_logs/queue_r5e.log

echo "=== $(date +%H:%M:%S) h: small irregular e2e at 64 parts ===" >> $L
run_item 3000 python scripts/scale_demo.py --irregular 96 6 6 --parts 64 \
  --steps 50000 --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --pmethod graph --fint auto --exchange psum \
  --out runs/irregular_96
echo "=== h exit $? ===" >> $L
commit "Irregular unstructured e2e at 64 parts, 96x6x6 seed (queue E h)" \
  runs/irregular_96 queue_logs/queue_r5e.log

echo "QUEUE E DONE ($(left)s left)" >> $L
commit "Queue E log final" queue_logs/queue_r5e.log
rm -f /tmp/queue_r5e.pid
