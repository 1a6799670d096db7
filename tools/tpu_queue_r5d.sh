#!/bin/sh
# Round-5 TPU queue #4 at HEAD (spec chain + onebuf) — one job at a time.
#   nohup sh tools/tpu_queue_r5d.sh > /tmp/tpu_queue_r5d.log 2>&1 &
set -x
cd /root/repo
# 0. storm soak with guarded dispatch + adaptive chain depth (the r5c
#    emit-tail fix): VERDICT r4 #6 target <= 0.05%
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r5d_storm.log 2>&1
echo "storm rc=$?"
# 1. bench at HEAD: superblock recovery check (H=2 horizons ride the
#    chain; uploads back-to-back) + the driver-record dress rehearsal
timeout 1500 python bench.py > /tmp/r5d_bench.log 2>&1
echo "bench rc=$?"
# 2. scheduled-traffic soak re-certification at HEAD (sequencer regime)
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    SOAK_SCHEDULE_TICKS=96 \
    python tools/tpu_soak_r3.py > /tmp/r5d_sched.log 2>&1
echo "sched rc=$?"
# 3. 4096-voice sustained live soak re-certification at HEAD
timeout 2700 env SOAK_MINUTES=10 LIBZL_TPU_VOICES=4096 \
    python tools/tpu_soak_r3.py > /tmp/r5d_4096.log 2>&1
echo "4096 rc=$?"
echo QUEUE_DONE
