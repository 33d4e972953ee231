#!/bin/bash
# Round-5 master chain: wait for the in-flight linear 384^3 re-land
# (queue C item c, running detached), then the flagship queue B, then
# the remaining queue C items. Strictly one TPU client at a time.
# Launch with: setsid nohup bash scripts/queue_r5_master.sh &
set -u
echo $$ > /tmp/queue_r5_master.pid
cd /root/repo
L=/tmp/queue_master.log
WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  echo "=== $(date +%H:%M:%S) master: waiting on pid $WAIT_PID ===" >> $L
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) master: queue B ===" >> $L
bash scripts/queue_r5b.sh
echo "=== $(date +%H:%M:%S) master: queue C ===" >> $L
bash scripts/queue_r5c.sh
echo "=== $(date +%H:%M:%S) master done ===" >> $L
rm -f /tmp/queue_r5_master.pid
