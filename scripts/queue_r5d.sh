#!/bin/bash
# Round-5 queue D: corrected continuation after the stage-4 hybrid
# fault at 384^3/256 (two identical crashes at the first fused group
# dispatch — diagnosis: the device-resident residual-history carry plus
# the in-scan stacked-LSTM transients at 256 parts exceed what the
# remote worker survives; see docs/STATUS_r5.md).
#
#   b1. flagship stage-4 rerun, arch=hybrid with hist_dtype=bfloat16
#       (halves the 2.3 GB history carry and its concat transient)
#   b2. fallback iff b1 landed no artifact: arch=expfit DOWNGRADE on
#       the same hybrid artifacts (closed-form base only — the r4-proven
#       program shape at this scale)
#   g.  full-scale comm account (8/16/64/256 parts)
#   f.  bench.py refresh
#   h.  irregular unstructured e2e at 64 parts (expfit)
#
# Strictly one TPU client; deadline-gated; commit after every item.
set -u
echo $$ > /tmp/queue_r5d.pid
trap 'kill -- -$$ 2>/dev/null' EXIT
cd /root/repo
mkdir -p queue_logs
L=queue_logs/queue_r5d.log
DEADLINE=${DEADLINE:-$(date -d '2026-08-21 02:50 UTC' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
run_item() {
  local cap=$1; shift
  local l; l=$(left)
  if [ "$l" -lt 300 ]; then echo "=== SKIP (deadline): $* ===" >> $L; return 124; fi
  local t=$cap; [ "$l" -lt "$cap" ] && t=$l
  timeout "$t" "$@" >> $L 2>&1
}
commit() { bash scripts/commit_artifacts.sh "$@" >> $L 2>&1; }

echo "=== $(date +%H:%M:%S) queue D start (pid $$, $(left)s to deadline) ===" >> $L

echo "=== $(date +%H:%M:%S) b1: nh_384 hybrid rerun, hist bf16 ===" >> $L
run_item 2700 python scripts/rerun_online.py --dir runs/nh_384 \
  --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
  --material neo_hookean --fint stencil --arch hybrid --order 16 \
  --modal 16 --no-consensus --cutoff 0.75 --skip-retrain \
  --hist-dtype bfloat16
echo "=== b1 exit $? ===" >> $L
commit "Flagship nh_384 stage-4 hybrid rerun with bf16 history carry (queue D b1)" \
  runs/nh_384 queue_logs/queue_r5d.log

if ! ls runs/nh_384/online_*hybrid*hbfloat16*.json >/dev/null 2>&1; then
  echo "=== $(date +%H:%M:%S) b2: nh_384 expfit-downgrade rerun ===" >> $L
  run_item 2400 python scripts/rerun_online.py --dir runs/nh_384 \
    --cells 384 16 16 --parts 256 --steps 200000 --pmethod box \
    --material neo_hookean --fint stencil --arch expfit --order 16 \
    --modal 16 --no-consensus --cutoff 0.75 --skip-retrain
  echo "=== b2 exit $? ===" >> $L
  commit "Flagship nh_384 stage-4 expfit-downgrade rerun (queue D b2)" \
    runs/nh_384 queue_logs/queue_r5d.log
else
  echo "=== b2 skipped: b1 artifact exists ===" >> $L
fi

echo "=== $(date +%H:%M:%S) g: comm account on TPU (8/16/64/256 parts) ===" >> $L
run_item 3600 python scripts/comm_account.py --steps 2000
echo "=== g exit $? ===" >> $L
commit "Full-scale per-step communication account on TPU (queue D g)" \
  BENCH_COMM.json queue_logs/queue_r5d.log

echo "=== $(date +%H:%M:%S) f: bench.py ===" >> $L
run_item 1500 python bench.py
echo "=== f exit $? ===" >> $L
commit "bench.py refresh on TPU with roofline fields (queue D f)" \
  BENCH_DETAILS.json queue_logs/queue_r5d.log

echo "=== $(date +%H:%M:%S) h: irregular unstructured e2e at 64 parts ===" >> $L
run_item 6000 python scripts/scale_demo.py --irregular 160 10 10 --parts 64 \
  --steps 100000 --arch expfit --order 16 --modal 8 --no-consensus \
  --cutoff 0.75 --pmethod graph --fint auto --exchange psum \
  --out runs/irregular_160
echo "=== h exit $? ===" >> $L
commit "Irregular unstructured end-to-end pipeline at 64 parts (queue D h)" \
  runs/irregular_160 queue_logs/queue_r5d.log

echo "QUEUE D DONE ($(left)s to deadline)" >> $L
commit "Queue D log final" queue_logs/queue_r5d.log
rm -f /tmp/queue_r5d.pid
