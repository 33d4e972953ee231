#!/bin/bash
# Round-5 queue B (restarted after the 2026-08-20 VM reboot destroyed
# the uncommitted queue-A stage-1/2 artifacts): run the FULL flagship
# nh_384 pipeline from stage 1, retry once from the deepest resumable
# stage on failure, and commit the small artifacts immediately.
# Launch with: setsid nohup bash scripts/queue_r5b.sh &
# The script records its own pid; as a setsid group leader, `kill -- -PID`
# tears down timeout+python too (the 08:21 incident left an orphaned
# python holding a TPU client after the wrapper died — two concurrent
# clients wedge the axon relay).
set -u
echo $$ > /tmp/queue_r5b.pid
trap 'kill -- -$$ 2>/dev/null' EXIT
cd /root/repo
mkdir -p queue_logs
L=queue_logs/queue_r5b.log
DEADLINE=${DEADLINE:-$(date -d '2026-08-21 02:50 UTC' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }

flagship() {
  timeout "$1" python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
    --steps 200000 --material neo_hookean --arch hybrid --order 16 --modal 16 \
    --no-consensus --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
    --from-stage "$2" --out runs/nh_384 >> $L 2>&1
}

resumable_stage() {
  d=runs/nh_384
  if [ -d "$d/Distributed_save" ] && [ -n "$(ls -A "$d/Distributed_save" 2>/dev/null)" ]; then echo 4
  elif [ -d "$d/Results/sol_on_shared" ] && [ -n "$(ls -A "$d/Results/sol_on_shared" 2>/dev/null)" ]; then echo 3
  elif [ -d "$d/Results/Dynamics" ] && [ -n "$(ls -A "$d/Results/Dynamics" 2>/dev/null)" ]; then echo 2
  else echo 1; fi
}

cap=$(( $(left) - 1800 )); [ $cap -gt 16000 ] && cap=16000
echo "=== $(date +%H:%M:%S) nh_384 FULL run from stage $(resumable_stage) (pid $$, cap ${cap}s) ===" >> $L
flagship "$cap" "$(resumable_stage)"
rc=$?
echo "=== exit $rc ===" >> $L
cap=$(( $(left) - 900 )); [ $cap -gt 9000 ] && cap=9000
if [ $rc -ne 0 ] && [ ! -f runs/nh_384/summary.json ] && [ $cap -gt 600 ]; then
  s="$(resumable_stage)"
  echo "=== $(date +%H:%M:%S) retry once from stage $s (cap ${cap}s) ===" >> $L
  flagship "$cap" "$s"
  echo "=== retry exit $? ===" >> $L
fi
bash scripts/commit_artifacts.sh \
  "Flagship neo-Hookean 384^3/256 hybrid pipeline artifacts (queue B)" \
  runs/nh_384 queue_logs/queue_r5b.log >> $L 2>&1
echo "QUEUE B DONE" >> $L
rm -f /tmp/queue_r5b.pid
