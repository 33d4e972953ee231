#!/bin/bash
# Round-4 queue G: neo-Hookean at the full 384^3/256 scale class —
# 589,824 tets / 334k DOFs / 256 shards, 200k-step reference schedule,
# stencil NH forces + grid exchange + face-plane online, hybrid
# surrogate (expfit16 base + residual LSTM modal16). VERDICT #1 asked
# for NH at 96^3/16 and 192^3/64 (both delivered, 0.022%/0.164%);
# this is the next octave: the nonlinear plant at the framework's
# largest demonstrated configuration.
set -u
cd /root/repo
L=/tmp/queue_r4g.log

echo "=== $(date +%H:%M:%S) nh_384: 384x16x16 / 256, neo-Hookean, hybrid, stencil+grid ===" >> $L
timeout 10000 python scripts/scale_demo.py --cells 384 16 16 --parts 256 \
  --steps 200000 --material neo_hookean --arch hybrid --order 16 --modal 16 \
  --no-consensus --cutoff 0.75 --pmethod box --fint stencil --exchange grid \
  --out runs/nh_384 >> $L 2>&1
echo "=== exit $? ===" >> $L

echo "QUEUE G DONE" >> $L
