#!/bin/sh
# Round-5 TPU queue #3 at HEAD (one-buffer horizon upload + orphan-build
# cancel) — one job at a time. Run with:
#   nohup sh tools/tpu_queue_r5c.sh > /tmp/tpu_queue_r5c.log 2>&1 &
set -x
cd /root/repo
# 1. chained quiet at HEAD: onebuf should cut the worker chain by the
#    relay's per-transfer fixed cost; adopt wait is the tell
timeout 2400 python tools/tpu_probe3_r5.py > /tmp/r5c_probe3.log 2>&1
echo "probe3 rc=$?"
# 2. storm soak with orphan-cancel (the r5b regression fix):
#    VERDICT r4 #6 target <= 0.05%
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r5c_storm.log 2>&1
echo "storm rc=$?"
echo QUEUE_DONE
