#!/bin/bash
# Round-5 queue A: the flagship neo-Hookean run at 384^3/256 (VERDICT r4 #1).
# 589,824 tets / 334k DOFs / 256 shards, 200k-step schedule (97% comm-free),
# stencil NH forces + grid exchange + face-plane online, hybrid surrogate.
# Fresh from stage 1: the r4 attempt's stage-1 artifacts were a 100k-step
# run (2000 trajectory cols), inconsistent with the 200k target.
set -u
cd /root/repo
L=/tmp/queue_r5a.log

echo "=== $(date +%H:%M:%S) nh_384: 384x16x16 / 256, neo-Hookean, hybrid, stencil+grid, 200k ===" >> $L
timeout 13000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
  --steps 200000 --material neo_hookean --arch hybrid --order 16 --modal 16 \
  --no-consensus --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
  --out runs/nh_384 >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE A DONE" >> $L
