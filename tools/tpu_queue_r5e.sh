#!/bin/sh
# Round-5 TPU queue #5 at HEAD (chain + guarded uploads + adaptive depth +
# 1 ms pump GIL switch) — one job at a time, priority order; later jobs are
# sacrificial if the round runs short.
#   nohup sh tools/tpu_queue_r5e.sh > /tmp/tpu_queue_r5e.log 2>&1 &
#   echo $! > /tmp/tpu_queue_r5e.pid
set -x
cd /root/repo
# 0. storm soak with guarded dispatch + adaptive chain depth (the r5c
#    emit-tail fix): VERDICT r4 #6 target <= 0.05%
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r5e_storm.log 2>&1
echo "storm rc=$?"
# 1. chained-quiet live path at HEAD (VERDICT r4 #2 target <= 0.9 ms/block
#    at V=1024/B=128; r5c measured 1.055 median on a slow-relay family)
timeout 1800 python tools/tpu_probe3_r5.py > /tmp/r5e_probe3.log 2>&1
echo "probe3 rc=$?"
# 2. bench at HEAD: the driver-record dress rehearsal (budget watchdog +
#    streaming retry parent; VERDICT r4 #1)
timeout 1500 python bench.py > /tmp/r5e_bench.log 2>&1
echo "bench rc=$?"
# 3. scheduled-traffic soak re-certification at HEAD (sequencer regime)
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    SOAK_SCHEDULE_TICKS=96 \
    python tools/tpu_soak_r3.py > /tmp/r5e_sched.log 2>&1
echo "sched rc=$?"
# 4. 4096-voice sustained live soak re-certification at HEAD
timeout 2700 env SOAK_MINUTES=10 LIBZL_TPU_VOICES=4096 \
    python tools/tpu_soak_r3.py > /tmp/r5e_4096.log 2>&1
echo "4096 rc=$?"
echo QUEUE_DONE
