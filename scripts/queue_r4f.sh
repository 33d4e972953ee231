#!/bin/bash
# Round-4 queue F: the curvilinear stencil at production scale — a
# LARGE annular tube (4x48x256 cells = 294,912 tets, 185k DOFs, 64
# parts) through the full 5-stage sync-avoiding pipeline on the
# gather/scatter-free path (.msh ingestion -> box partition over the
# periodic theta/z axes -> stencil forces with per-cell geometry ->
# grid exchange with the seam pair -> face-plane online), hybrid
# surrogate. The tube_demo/tube_hybrid runs proved accuracy at toy
# size; this is the scale row.
set -u
cd /root/repo
L=/tmp/queue_r4f.log

d=0
while ! grep -q 'QUEUE E DONE' /tmp/queue_r4e.log 2>/dev/null; do
  sleep 30; d=$((d + 30)); [ $d -ge 10800 ] && break
done

echo "=== $(date +%H:%M:%S) tube_scale: 4x48x256 / 64, hybrid, stencil+grid ===" >> $L
timeout 7000 python scripts/scale_demo.py --tube 4 48 256 --parts 64 \
  --steps 100000 --arch hybrid --order 16 --modal 16 --no-consensus \
  --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
  --out runs/tube_scale >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE F DONE" >> $L
