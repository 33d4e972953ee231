#!/bin/bash
# Round-5 master chain (post-reboot restart): flagship queue B (full
# nh_384 pipeline) then the measurement queue C. Strictly one TPU
# client at a time; both queues commit artifacts as they land and
# respect the 02:50 UTC deadline so the device is free for the
# driver's end-of-round bench.
# Launch with: setsid nohup bash scripts/tpu_wait_launch.sh scripts/queue_r5_master.sh &
set -u
echo $$ > /tmp/queue_r5_master.pid
cd /root/repo
mkdir -p queue_logs
L=queue_logs/queue_master.log
echo "=== $(date +%H:%M:%S) master: queue B ===" >> $L
bash scripts/queue_r5b.sh
echo "=== $(date +%H:%M:%S) master: queue C ===" >> $L
bash scripts/queue_r5c.sh
echo "=== $(date +%H:%M:%S) master done ===" >> $L
rm -f /tmp/queue_r5_master.pid
