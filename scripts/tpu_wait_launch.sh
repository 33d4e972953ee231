#!/bin/bash
# Probe the axon TPU worker until it answers, then launch the given
# queue script as a setsid group leader. Usage:
#   setsid nohup bash scripts/tpu_wait_launch.sh scripts/queue_r5b.sh &
set -u
cd /root/repo
Q="$1"
mkdir -p queue_logs
L=queue_logs/tpu_wait.log
echo "=== $(date +%H:%M:%S) waiting for TPU worker ($Q) ===" >> $L
while :; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); float((x @ x).sum())" >> $L 2>&1; then
    echo "=== $(date +%H:%M:%S) worker answered; launching $Q ===" >> $L
    setsid nohup bash "$Q" >> $L 2>&1 &
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) still wedged ===" >> $L
  sleep 180
done
