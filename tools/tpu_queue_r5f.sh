#!/bin/sh
# Round-5 TPU queue #6: re-certify the three soak regimes at the fixed
# HEAD (fixed spec depth 2 + adopt-kind H-block budget + slo_worst
# context ring). The r5e campaign measured all three regressed at the
# adaptive-depth HEAD (storm 1.118%, sched 0.621%, 4096 1.84% — NOTES
# round-5 campaign #4/#5).
#   nohup sh tools/tpu_queue_r5f.sh > /tmp/tpu_queue_r5f.log 2>&1 &
set -x
cd /root/repo
# 0. storm (VERDICT r4 #6 target <= 0.05%)
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r5f_storm.log 2>&1
echo "storm rc=$?"
# 1. scheduled sequencer regime
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    SOAK_SCHEDULE_TICKS=96 \
    python tools/tpu_soak_r3.py > /tmp/r5f_sched.log 2>&1
echo "sched rc=$?"
# 2. 4096-voice sustained live
timeout 2700 env SOAK_MINUTES=10 LIBZL_TPU_VOICES=4096 \
    python tools/tpu_soak_r3.py > /tmp/r5f_4096.log 2>&1
echo "4096 rc=$?"
echo QUEUE_DONE
