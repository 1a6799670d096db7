#!/bin/sh
# Round-4 TPU validation queue at HEAD (one job at a time — the relay is
# exclusive; NOTES_TPU_ENV.md protocol). Run with:
#   nohup sh tools/tpu_queue_r4b.sh > /tmp/tpu_queue_r4b.log 2>&1 &
set -x
cd /root/repo
# 1. event-storm soak at HEAD (VERDICT r3 #1 target: <=0.15% SLO)
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r4b_storm.log 2>&1
# 2. scheduled-traffic soak (sequencer regime — quiet-regime SLO target)
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    SOAK_SCHEDULE_TICKS=96 \
    python tools/tpu_soak_r3.py > /tmp/r4b_sched.log 2>&1
# 3. 4096-voice sustained soak (VERDICT r3 #3)
timeout 2700 env SOAK_MINUTES=10 LIBZL_TPU_VOICES=4096 \
    python tools/tpu_soak_r3.py > /tmp/r4b_4096.log 2>&1
# 4. a64 re-probe (standing instruction)
timeout 1800 python tools/tpu_probe6_r3.py > /tmp/r4b_a64.log 2>&1
# 5. full bench at HEAD (has its own relay-outage retry wrapper)
timeout 9000 python bench.py > /tmp/r4b_bench.log 2>&1
echo QUEUE_DONE
